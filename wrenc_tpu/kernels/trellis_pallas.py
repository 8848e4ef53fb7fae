"""Pallas TPU kernel: sequential in-VMEM dependent-quantization Viterbi.

The round-3 device commit ran the 8-state trellis as a min-plus
associative scan (kernels/quantize.trellis_pscan_impl). That is
log-depth, but every combine materializes (B, P, 8, 8) int32 arrays in
HBM whose 8-wide minor axis pads to 128 lanes — a 16x bandwidth tax that
dominated the commit scan (results/device_commit_r3.md bottleneck 1) and
is the suspected cause of the round-3 TPU worker crash (HBM pressure).

This kernel runs the textbook sequential Viterbi instead, entirely in
VMEM: a fori over the P scan positions with the 8 per-block state costs
held as one (8, 128) register tile (states on sublanes, blocks on
lanes). A P-step loop over VMEM-resident rows has no HBM traffic at all
beyond streaming the per-position edge ingredients once, so it is
latency-free in the sense of pallas_guide.md ("a fori over P inside VMEM
is latency-free"). Backpointers are packed 4 bits/state into one int32
lane per position; the backtrack (and the committed-level rate
accumulation, replacing quantize.dq_rate_impl's padded (B, P, 8)
composition) run inside the same kernel.

Decision discipline is bit-identical to spec/quant.py, the native C++
trellis and trellis_pscan_impl (same candidate model from
quantizer.rs:338-518, same src-major/k-minor strict-< relax order on
ties, same per-step cost normalization, same first-index argmin at the
end). The committed-rate value matches quantize.dq_rate_scan exactly
(same f32 accumulation order: ascending coding-order positions).

Rate-table lookups stay OUTSIDE the kernel: the per-position candidate
levels depend on the state only through delta (2 values) and k (2
values), so a compact (2, 2, P, B) grid of costs/levels/rates is
precomputed with the exact one-hot MXU LUT (quantize._lut1024_i32) and
streamed to the kernel — the kernel itself does no gathers.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import quantize as kq

BIG = np.int32(1 << 29)
LANES = 128


def _interpret():
    # tests run on the forced-CPU backend; the compiled Mosaic path is
    # TPU-only
    return jax.default_backend() != "tpu"


def _kernel(P):
    # NOTE: every vector intermediate is kept rank-2 ((1, Bt) rows /
    # (8, Bt) tiles) — Mosaic's vector-layout inference aborts on rank-1
    # elementwise ops (VectorLayout::join check failure).
    def kernel(c4_ref, sa4_ref, lv4_ref, scal_ref, q_ref, rate_ref,
               cost_ref, bp_ref, rbuf_ref):
        Bt = LANES
        lam1 = scal_ref[0]
        lv0f = scal_ref[1].astype(jnp.float32)
        iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, Bt), 0)
        cost_ref[:, :] = jnp.where(iota8 == 1, 0, BIG)

        def fwd(p, _):
            cost = cost_ref[:, :]
            is_dc = (p == P - 1).astype(jnp.int32)
            rows_c = [c4_ref[j, pl.ds(p, 1), :] for j in range(4)]
            rows_sa = [sa4_ref[j, pl.ds(p, 1), :] for j in range(4)]
            new_cost = jnp.full((8, Bt), BIG, jnp.int32)
            bp = jnp.zeros((8, Bt), jnp.int32)
            # relax order: source state OUTER, k INNER, strict < — the
            # native/spec tie-breaking (wrenc_native.cpp wrenc_trellis_quant)
            for src in range(8):
                qs = src >> 1
                tr = src & 1
                delta = 1 if qs > 1 else 0
                for k in range(2):
                    slot = 2 * src + k
                    j = delta * 2 + k
                    sa = rows_sa[j]                       # (1, Bt)
                    az = (sa == 0)
                    par = sa & 1
                    c = rows_c[j]
                    if tr:
                        # trailing zeros are free (rate4(a=0)=lam_dq[1] was
                        # baked into c4); the DC position refunds lam_dq[1]
                        # once more (all-zero-block correction)
                        azi = az.astype(jnp.int32)
                        c = c - azi * lam1 - azi * lam1 * is_dc
                        dst = (((qs ^ par) & 1) * 2 + (qs >> 1)) * 2 + azi
                    else:
                        dst = (((qs ^ par) & 1) * 2 + (qs >> 1)) * 2
                    tot = cost_ref[pl.ds(src, 1), :] + c  # (1, Bt)
                    hit = (dst == iota8) & (tot < new_cost)
                    new_cost = jnp.where(hit, tot, new_cost)
                    bp = jnp.where(hit, slot, bp)
            new_cost = new_cost - jnp.min(new_cost, axis=0, keepdims=True)
            cost_ref[:, :] = new_cost
            # pack 8 nibbles (slot per dst state) into one int32 per lane
            bp_ref[pl.ds(p, 1), :] = jnp.sum(bp << (4 * iota8), axis=0,
                                             keepdims=True)
            return 0

        jax.lax.fori_loop(0, P, fwd, 0, unroll=False)

        # first-index argmin over the 8 final states (matches jnp.argmin)
        best = cost_ref[0:1, :]
        state = jnp.zeros((1, Bt), jnp.int32)
        for s in range(1, 8):
            row = cost_ref[s:s + 1, :]
            better = row < best
            best = jnp.where(better, row, best)
            state = jnp.where(better, s, state)

        def bwd(i, state):
            p = P - 1 - i
            packed = bp_ref[pl.ds(p, 1), :]               # (1, Bt)
            slot = (packed >> (4 * state)) & 0xF
            src = slot >> 1
            k = slot & 1
            delta = (src >= 4).astype(jnp.int32)
            j = delta * 2 + k
            sa_rows = [sa4_ref[jj, pl.ds(p, 1), :] for jj in range(4)]
            lv_rows = [lv4_ref[jj, pl.ds(p, 1), :] for jj in range(4)]

            def sel4(rows):
                r = jnp.where(j == 0, rows[0], rows[1])
                r = jnp.where(j == 2, rows[2], r)
                return jnp.where(j == 3, rows[3], r)

            sa = sel4(sa_rows)
            lvj = sel4(lv_rows)
            az = sa == 0
            mag = 2 * jnp.abs(sa) - delta
            qv = jnp.where(az, 0, jnp.where(sa < 0, -mag, mag))
            tr = src & 1
            r = jnp.where(az, jnp.where(tr == 1, jnp.float32(0), lv0f),
                          lvj.astype(jnp.float32))
            q_ref[pl.ds(p, 1), :] = qv
            rbuf_ref[pl.ds(p, 1), :] = r
            return src

        jax.lax.fori_loop(0, P, bwd, state, unroll=False)

        # committed-level rate in ASCENDING coding order (dq_rate_scan's
        # exact f32 accumulation order, which the native committer shares)
        def acc(p, rate):
            return rate + rbuf_ref[pl.ds(p, 1), :]

        rate_ref[0:1, :] = jax.lax.fori_loop(
            0, P, acc, jnp.zeros((1, Bt), jnp.float32), unroll=False)

    return kernel


@functools.lru_cache(maxsize=None)
def _call(P, nb, interpret):
    grid = (nb,)
    kern = _kernel(P)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, P, LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, P, LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, P, LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((P, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((P, nb * LANES), jnp.int32),
            jax.ShapeDtypeStruct((1, nb * LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, LANES), jnp.int32),      # state costs
            pltpu.VMEM((P, LANES), jnp.int32),      # packed backpointers
            pltpu.VMEM((P, LANES), jnp.float32),    # per-position lv rate
        ],
        interpret=interpret,
    )


def trellis_rate_impl(t, ls, bd_shift, lam_dq, lv_table, log2_n):
    """Exact 8-state trellis + committed-level rate, Pallas TPU kernel.

    t: (B, n, n) int32 transform coefficients; ls/bd_shift scalars or
    (B,) per-row; lam_dq (1024,) int32; lv_table (1024,) f32 (integral
    values). Returns (q (B, n, n) int16 stored levels — identical to
    trellis_depquant/trellis_pscan_impl — and rate (B,) f32 — identical
    to dq_rate_scan(q)). Non-jitted; call inside jit."""
    B = t.shape[0]
    order = kq.coding_order(log2_n)
    P = order.shape[0]
    tf = t.reshape(B, -1)[:, order]                       # (B, P)

    def rowp(v):
        v = jnp.asarray(v)
        if v.ndim == 0:
            return v
        return v.reshape(1, 1, 1, B)

    lsr = rowp(ls)
    bdr = rowp(bd_shift)
    bdo = (1 << bdr) >> 1
    tc = tf.T[None, None]                                 # (1, 1, P, B)
    atc = jnp.abs(tc)
    s_ = (atc << bdr) + jnp.where(tc < 0, bdo, -bdo)
    base = s_ // lsr
    zero = tc == 0
    dlt = jnp.arange(2, dtype=jnp.int32).reshape(2, 1, 1, 1)
    kk = jnp.arange(2, dtype=jnp.int32).reshape(1, 2, 1, 1)
    a4 = jnp.where(zero, 0, (base + dlt) // 2 + kk)       # (2, 2, P, B)
    mag4 = jnp.where(a4 == 0, 0, 2 * a4 - dlt)
    dq4 = (mag4 * lsr + bdo) >> bdr
    dist4 = jnp.abs(atc - dq4)
    # compact-grid rate lookups (see trellis_rate_batch): one LUT at
    # m0 = base//2 over index-shifted tables answers all four candidates
    ldq = jnp.asarray(lam_dq)
    ldq1 = jnp.concatenate([ldq[1:], ldq[-1:]])
    lvi = jnp.asarray(lv_table).astype(jnp.int32)

    def shtab(t, j):
        return jnp.concatenate([t[j:], jnp.repeat(t[-1:], j)]) if j else t

    m0 = jnp.where(zero[0, 0], 0, (base // 2)[0, 0])      # (1, B)? no (P,B)
    m0 = m0.reshape(-1)
    idx = jnp.clip(m0, 0, 1023)
    r0, r1, r2, l0, l1, l2 = kq._lut1024_i32_multi(
        (ldq1, shtab(ldq1, 1), shtab(ldq1, 2),
         lvi, shtab(lvi, 1), shtab(lvi, 2)), idx)
    PB = a4.shape[2] * a4.shape[3]

    def ex(v):
        return v.reshape(a4.shape[2], a4.shape[3])[None, None]

    off0 = a4 - ex(m0)
    rate4 = jnp.where(off0 == 0, ex(r0),
                      jnp.where(off0 == 1, ex(r1), ex(r2)))
    lv4 = jnp.where(off0 == 0, ex(l0), jnp.where(off0 == 1, ex(l1),
                                                 ex(l2)))
    c4 = jnp.minimum(128 * dist4 + rate4, BIG)
    c4 = jnp.where(zero & (kk == 1), BIG, c4)             # zeros: one option
    sa4 = jnp.where(tc < 0, -a4, a4)

    Bp = -(-B // LANES) * LANES
    pad = Bp - B

    def padb(x):
        x = x.reshape(4, P, B)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
        return x

    scal = jnp.stack([jnp.asarray(lam_dq)[1],
                      jnp.asarray(lv_table).astype(jnp.int32)[0]])
    qpb, rate = _call(P, Bp // LANES, _interpret())(
        padb(c4), padb(sa4), padb(lv4), scal)
    qf = qpb[:, :B].T                                     # (B, P)
    q = jnp.zeros((B, (1 << log2_n) ** 2), jnp.int32)
    q = q.at[:, order].set(qf)
    return q.reshape(t.shape).astype(jnp.int16), rate[0, :B]


@functools.partial(jax.jit, static_argnums=(5,))
def trellis_rate(t, ls, bd_shift, lam_dq, lv_table, log2_n):
    return trellis_rate_impl(t, ls, bd_shift, lam_dq, lv_table, log2_n)


def build_rate_tabs(lam_dq, lv_table):
    """Index-shifted rate tables for the compact-grid LUT, built ONCE
    per scan invocation (callers inside a lax.scan body must hoist these
    — rebuilt per step they add ~20 small kernels to every rank step)."""
    ldq = jnp.asarray(lam_dq)
    ldq1 = jnp.concatenate([ldq[1:], ldq[-1:]])
    lvi = jnp.asarray(lv_table).astype(jnp.int32)

    def shtab(t, j):
        return jnp.concatenate([t[j:], jnp.repeat(t[-1:], j)]) if j else t

    scal = jnp.stack([ldq[1], lvi[0]])
    return ((ldq1, shtab(ldq1, 1), shtab(ldq1, 2),
             lvi, shtab(lvi, 1), shtab(lvi, 2)), scal)


def trellis_rate_batch(jobs, lam_dq, lv_table, tabs=None):
    """Batched variant for several block sizes at once: jobs is a list of
    (t (B, n, n) int32, ls, bd_shift, log2_n). The per-position edge
    ingredients are elementwise over flattened (position, block) pairs,
    so ONE shared precompute pass (divisions, the one-hot MXU rate LUT)
    serves every size; only the in-VMEM Viterbi runs per distinct P.
    Returns [(q (B, n, n) int16, rate (B,) f32)] in job order — values
    identical to per-job trellis_rate_auto."""
    if _interpret():
        return [trellis_rate_auto(t, ls, bd_shift, lam_dq, lv_table, lg)
                for t, ls, bd_shift, lg in jobs]
    metas = []
    tf_parts = []
    ls_parts = []
    bd_parts = []
    for t, ls, bd_shift, log2_n in jobs:
        B = t.shape[0]
        order = kq.coding_order(log2_n)
        P = order.shape[0]
        tf = t.reshape(B, -1)[:, order].T                 # (P, B)
        lsb = jnp.broadcast_to(jnp.asarray(ls, jnp.int32), (B,))
        bdb = jnp.broadcast_to(jnp.asarray(bd_shift, jnp.int32), (B,))
        metas.append((B, P, log2_n, order))
        tf_parts.append(tf.reshape(-1))
        ls_parts.append(jnp.broadcast_to(lsb[None, :], (P, B)).reshape(-1))
        bd_parts.append(jnp.broadcast_to(bdb[None, :], (P, B)).reshape(-1))
    tc = jnp.concatenate(tf_parts)[None, None, :]         # (1, 1, N)
    lsr = jnp.concatenate(ls_parts)[None, None, :]
    bdr = jnp.concatenate(bd_parts)[None, None, :]
    bdo = (1 << bdr) >> 1
    atc = jnp.abs(tc)
    s_ = (atc << bdr) + jnp.where(tc < 0, bdo, -bdo)
    base = s_ // lsr
    zero = tc == 0
    dlt = jnp.arange(2, dtype=jnp.int32).reshape(2, 1, 1)
    kk = jnp.arange(2, dtype=jnp.int32).reshape(1, 2, 1)
    a4 = jnp.where(zero, 0, (base + dlt) // 2 + kk)       # (2, 2, N)
    mag4 = jnp.where(a4 == 0, 0, 2 * a4 - dlt)
    dq4 = (mag4 * lsr + bdo) >> bdr
    dist4 = jnp.abs(atc - dq4)
    # rate lookups on the COMPACT base-index grid: the four (delta, k)
    # level candidates all lie in {m0, m0+1, m0+2} with m0 = base//2, so
    # one multi-table LUT at m0 over index-shifted tables answers all of
    # them at 1/4 the one-hot volume (the LUT traffic dominated the
    # 1080p step profile)
    if tabs is None:
        tabs = build_rate_tabs(lam_dq, lv_table)
    (t6, scal) = tabs
    m0 = jnp.where(zero[0, 0], 0, (base // 2)[0, 0])      # (N,)
    idx = jnp.clip(m0, 0, 1023)
    r0, r1, r2, l0, l1, l2 = kq._lut1024_i32_multi(t6, idx)
    off0 = a4 - m0[None, None, :]                          # in {0, 1, 2}
    rate4 = jnp.where(off0 == 0, r0,
                      jnp.where(off0 == 1, r1, r2))
    lv4 = jnp.where(off0 == 0, l0, jnp.where(off0 == 1, l1, l2))
    c4 = jnp.minimum(128 * dist4 + rate4, BIG)
    c4 = jnp.where(zero & (kk == 1), BIG, c4)
    sa4 = jnp.where(tc < 0, -a4, a4)

    c4f = c4.reshape(4, -1)
    sa4f = sa4.reshape(4, -1)
    lv4f = lv4.reshape(4, -1)
    out = []
    off = 0
    for B, P, log2_n, order in metas:
        n_el = P * B
        Bp = -(-B // LANES) * LANES
        pad = Bp - B

        def padb(x):
            x = x[:, off:off + n_el].reshape(4, P, B)
            if pad:
                x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
            return x

        qpb, rate = _call(P, Bp // LANES, False)(
            padb(c4f), padb(sa4f), padb(lv4f), scal)
        qf = qpb[:, :B].T                                 # (B, P)
        q = jnp.zeros((B, (1 << log2_n) ** 2), jnp.int32)
        q = q.at[:, order].set(qf)
        out.append((q.reshape(B, 1 << log2_n, 1 << log2_n
                              ).astype(jnp.int16), rate[0, :B]))
        off += n_el
    return out


def trellis_rate_auto(t, ls, bd_shift, lam_dq, lv_table, log2_n):
    """Pallas kernel on TPU; on the CPU test backend, the bit-identical
    (proven by tests/test_trellis_pallas.py) pscan + sequential-rate pair
    — interpret-mode Pallas inside the commit scan is orders of magnitude
    slower than compiled XLA on CPU."""
    if _interpret():
        q = kq.trellis_pscan_impl(t, ls, bd_shift, lam_dq, log2_n)
        return q, kq.dq_rate_scan_impl(q, log2_n, lv_table)
    return trellis_rate_impl(t, ls, bd_shift, lam_dq, lv_table, log2_n)
