"""ctypes loader/wrapper for the native runtime (wrenc_native.cpp).

Builds the shared library on first use with g++ (no pybind11 in this
environment; plain C ABI + ctypes). Falls back gracefully when no compiler
is available — callers check `available()`.
"""
import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "wrenc_native.cpp")
_SO = os.path.join(_DIR, "libwrenc_native.so")
_lock = threading.Lock()
_lib = None
_failed = False


def _build():
    subprocess.run(
        ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
         _SRC, "-o", _SO],
        check=True, capture_output=True)


def _get():
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.wrenc_trellis_quant.restype = None
            lib.wrenc_greedy_quant.restype = None
            lib.wrenc_encode_slice.restype = ctypes.c_int64
            _lib = lib
        except Exception:
            _failed = True
        return _lib


def available():
    return _get() is not None


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def trellis_quant_native(t, ls, bd_shift, lam_dq, log2_n):
    """t: (B, n, n) int32 -> q (B, n, n) int16 (exact trellis)."""
    lib = _get()
    t = np.ascontiguousarray(t, dtype=np.int32)
    lam = np.ascontiguousarray(lam_dq, dtype=np.int32)
    q = np.zeros(t.shape, dtype=np.int16)
    lib.wrenc_trellis_quant(
        _i32p(t), ctypes.c_int(t.shape[0]), ctypes.c_int(log2_n),
        ctypes.c_int32(ls), ctypes.c_int32(bd_shift), _i32p(lam),
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)))
    return q


def greedy_quant_native(t, ls, bd_shift, lam_dq, log2_n):
    lib = _get()
    t = np.ascontiguousarray(t, dtype=np.int32)
    lam = np.ascontiguousarray(lam_dq, dtype=np.int32)
    q = np.zeros(t.shape, dtype=np.int16)
    lib.wrenc_greedy_quant(
        _i32p(t), ctypes.c_int(t.shape[0]), ctypes.c_int(log2_n),
        ctypes.c_int32(ls), ctypes.c_int32(bd_shift), _i32p(lam),
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)))
    return q


_TREE_ID = {'S': 0, 'L': 1, 'C': 2}


def serialize_decisions(trees):
    """Flatten CtNode trees into (nodes, cu_data, coeff_offs, coeffs)."""
    nodes = []
    cu_data = []
    coeff_offs = []
    coeff_chunks = []
    total = 0

    def walk(n):
        nonlocal total
        if n.split:
            nodes.append(-1)
            for ch in n.children:
                walk(ch)
        else:
            cu = n.cu
            nodes.append(len(cu_data) // 6)
            cu_data.extend([cu.x, cu.y, cu.log2, _TREE_ID[cu.tree],
                            cu.luma_mode, cu.chroma_mode])
            for c in range(3):
                q = cu.coeffs[c]
                if q is None:
                    coeff_offs.append(-1)
                else:
                    q = np.ascontiguousarray(q, dtype=np.int16)
                    coeff_offs.append(total)
                    coeff_chunks.append(q.ravel())
                    total += q.size

    for t in trees:
        walk(t)
    coeffs = (np.concatenate(coeff_chunks) if coeff_chunks
              else np.zeros(1, dtype=np.int16))
    return (np.array(nodes, dtype=np.int32),
            np.array(cu_data, dtype=np.int32),
            np.array(coeff_offs, dtype=np.int64),
            coeffs)


def _ctx_arrays():
    from ...core import tables
    offsets, inits, shifts = tables.cabac_ctx_layout()
    n_se = 110
    se_off = np.full(n_se, -1, dtype=np.int32)
    for se_id, off in offsets.items():
        se_off[se_id] = off
    return se_off, inits[0].astype(np.int32), shifts[0].astype(np.int32)


def _encode_slice(cfg, trees, slice_qp, wpp):
    lib = _get()
    nodes, cu_data, coeff_offs, coeffs = serialize_decisions(trees)
    se_off, inits, shifts = _ctx_arrays()
    cap = max(1 << 16, coeffs.size * 8 + 4096)
    out = np.zeros(cap, dtype=np.uint8)
    n_rows = cfg.height >> cfg.log2_ctu_size
    marks = np.zeros(max(n_rows, 1), dtype=np.int64)
    n = lib.wrenc_encode_slice(
        ctypes.c_int(cfg.width), ctypes.c_int(cfg.height),
        ctypes.c_int(cfg.log2_ctu_size), ctypes.c_int(slice_qp),
        ctypes.c_int(1 if cfg.dep_quant_enabled else 0),
        ctypes.c_int(1 if cfg.transform_skip_enabled else 0),
        ctypes.c_int(1 if cfg.cclm_enabled else 0),
        _i32p(se_off), ctypes.c_int(len(se_off)),
        _i32p(inits), _i32p(shifts), ctypes.c_int(len(inits)),
        _i32p(nodes), ctypes.c_int64(len(nodes)),
        _i32p(cu_data), ctypes.c_int64(len(cu_data) // 6),
        coeff_offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        coeffs.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(cap),
        ctypes.c_int(1 if wpp else 0),
        marks.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    assert n > 0, "native slice buffer overflow"
    return bytes(out[:n]), marks


def encode_slice_native(cfg, trees, slice_qp):
    """Entropy-code one slice's CTU decision trees -> CABAC payload bytes."""
    return _encode_slice(cfg, trees, slice_qp, wpp=False)[0]


def wpp_supported():
    return available()


def encode_slice_wpp_native(cfg, trees, slice_qp):
    """WPP slice: returns (entry_lens, payload bytes)."""
    data, marks = _encode_slice(cfg, trees, slice_qp, wpp=True)
    n_rows = cfg.height >> cfg.log2_ctu_size
    lens = [int(marks[r] - (marks[r - 1] if r else 0))
            for r in range(n_rows - 1)]
    return lens, data
