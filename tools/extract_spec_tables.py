#!/usr/bin/env python3
"""Extract H.266/VVC specification constant tables into JSON data files.

The tables extracted here are pure data defined by the VVC standard (ITU-T H.266):
transform-matrix coefficients (spec 8.7.4.4 tables), LFNST matrices (8.7.4.3),
CABAC context initialisation values / window-shift indices (Table 51), and the
Rice-parameter lookup (Table 126).  The reference encoder at /root/reference
carries the same constants in Rust source (transformer.rs, cabac_contexts.rs);
we parse the numbers out of those declarations so the values are guaranteed to
match the spec tables the reference uses.

Output: wrenc_tpu/core/data/*.json
Run:    python tools/extract_spec_tables.py
"""
import json
import os
import re

REF = "/root/reference/src"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "wrenc_tpu", "core", "data")


def read(path):
    with open(path) as f:
        src = f.read()
    # Strip `//` line comments so bracket characters inside comments (including
    # commented-out table rows) cannot corrupt bracket-depth parsing.
    return re.sub(r"//[^\n]*", "", src)


def parse_int_lists(text):
    """Parse all integers in the text into a flat list."""
    return [int(x) for x in re.findall(r"-?\d+", text)]


def extract_const_array(src, name):
    """Extract `const NAME: [[i16; W]; H] = [ ... ];` as a list of rows."""
    m = re.search(rf"const {name}: \[\[i16; (\d+)\]; (\d+)\] = \[", src)
    assert m, name
    w, h = int(m.group(1)), int(m.group(2))
    start = m.end()
    depth = 1
    i = start
    while depth > 0:
        if src[i] == "[":
            depth += 1
        elif src[i] == "]":
            depth -= 1
        i += 1
    vals = parse_int_lists(src[start:i - 1])
    assert len(vals) == w * h, (name, len(vals), w * h)
    return [vals[r * w:(r + 1) * w] for r in range(h)]


def extract_vec_base(src, anchor):
    """Extract the `let B = vec![vec![...], ...];` block following `anchor`."""
    i = src.index(anchor)
    i = src.index("let B = vec![", i)
    start = i + len("let B = vec![")
    depth = 1
    j = start
    while depth > 0:
        if src[j] == "[":
            depth += 1
        elif src[j] == "]":
            depth -= 1
        j += 1
    body = src[start:j - 1]
    rows = []
    for rm in re.finditer(r"vec!\[([^\]]*)\]", body):
        rows.append([int(x) for x in re.findall(r"-?\d+", rm.group(1))])
    # Note: the 32-point MTS matrices store only the first 16 rows (the
    # high-frequency half is always zeroed out by the MTS 16-coefficient rule).
    w = len(rows[0])
    assert all(len(r) == w for r in rows), anchor
    return rows


def extract_ctx_table(src):
    """Extract the 110-entry CABAC context table (VVC Table 51 data).

    Each entry: None (unused element) or
    {"init": [[I...],[P...],[B...]], "shift": [[I...],[P...],[B...]]}.
    """
    i = src.index("pub static ref ctx_table")
    i = src.index("= vec![", i) + len("= vec![")
    depth = 1
    j = i
    while depth > 0:
        if src[j] == "[":
            depth += 1
        elif src[j] == "]":
            depth -= 1
        j += 1
    body = src[i:j - 1]
    # Split into top-level `vec![ ... ],` entries.
    entries = []
    k = 0
    n = len(body)
    while k < n:
        m = re.compile(r"vec!\[").search(body, k)
        if not m:
            break
        start = m.end()
        depth = 1
        p = start
        while depth > 0:
            if body[p] == "[":
                depth += 1
            elif body[p] == "]":
                depth -= 1
            p += 1
        entries.append(body[m.start():p])
        k = p
    # Indices 0..106 (CoeffSignFlag). EndOf{Slice,Tile,Subset}OneBit (107-109)
    # use the CABAC terminate bin and have no context entry.
    assert len(entries) == 107, len(entries)
    out = []
    for e in entries:
        inner = e[len("vec!["):-1].strip()
        if not inner:
            out.append(None)
            continue
        groups = []
        k = 0
        while True:
            m = re.compile(r"vec!\[").search(inner, k)
            if not m:
                break
            start = m.end()
            depth = 1
            p = start
            while depth > 0:
                if inner[p] == "[":
                    depth += 1
                elif inner[p] == "]":
                    depth -= 1
                p += 1
            groups.append(inner[m.start():p])
            k = p
        # groups[0] = init vec (containing 3 inner vecs), groups after it are its
        # children; easier: re-parse two top-level groups.
        tops = []
        k = 0
        while True:
            m = re.compile(r"vec!\[").search(inner, k)
            if not m:
                break
            start = m.end()
            depth = 1
            p = start
            while depth > 0:
                if inner[p] == "[":
                    depth += 1
                elif inner[p] == "]":
                    depth -= 1
                p += 1
            tops.append(inner[m.start():p])
            k = p
        assert len(tops) == 2, inner[:200]
        def triples(t):
            rows = []
            for rm in re.finditer(r"vec!\[([^\[\]]*)\]", t):
                rows.append([int(x) for x in re.findall(r"-?\d+", rm.group(1))])
            assert len(rows) == 3, t[:200]
            return rows
        out.append({"init": triples(tops[0]), "shift": triples(tops[1])})
    return out


def main():
    os.makedirs(OUT, exist_ok=True)
    tsrc = read(os.path.join(REF, "transformer.rs"))
    csrc = read(os.path.join(REF, "cabac_contexts.rs"))

    data = {}
    # DCT-II 64-point base (left half; right half is mirror-symmetric).
    data["dct2_base64_half"] = extract_const_array(tsrc, "TRANS_MATRIX_0_")
    # DST-VII and DCT-VIII square bases.
    for size in (4, 8, 16, 32):
        data[f"dst7_{size}"] = extract_vec_base(tsrc, f"pub static ref TRANS_MATRIX_1_{size}")
        data[f"dct8_{size}"] = extract_vec_base(tsrc, f"pub static ref TRANS_MATRIX_2_{size}")
    with open(os.path.join(OUT, "transform_matrices.json"), "w") as f:
        json.dump(data, f)

    lfnst = {}
    for n in (16, 48):
        for s in range(4):
            for idx in (1, 2):
                name = f"LOW_FREQ_TRANS_MATRIX_{n}_{s}_{idx}"
                lfnst[f"{n}_{s}_{idx}"] = extract_const_array(tsrc, name)
    with open(os.path.join(OUT, "lfnst_matrices.json"), "w") as f:
        json.dump(lfnst, f)

    cab = {
        "ctx_table": extract_ctx_table(csrc),
        "c_rice_params": parse_int_lists(
            re.search(r"pub const c_rice_params: \[usize; 32\] = \[([^\]]*)\]", csrc).group(1)),
    }
    assert len(cab["c_rice_params"]) == 32
    with open(os.path.join(OUT, "cabac_init.json"), "w") as f:
        json.dump(cab, f)

    print("wrote", os.listdir(OUT))


if __name__ == "__main__":
    main()
