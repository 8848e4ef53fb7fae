"""NumPy twins of the batched kernels, used by the wavefront commit pass.

The commit pass runs many small variable-size batches (one per dependency
rank x block size); doing it in vectorized NumPy avoids a jit recompile per
batch shape while staying bit-exact with the spec model (same integer
formulas as kernels/{transforms,quantize}.py).
"""
import numpy as np

from ..core import tables
from . import intra_mats, quantize as kq


def predict_modes_np(v, mode_ids, size, c_idx):
    """Single-mode batched prediction: v (N, 2L) int, mode_ids (N,)."""
    m = intra_mats.build_mode_matrices(size, c_idx)
    W1 = m["W1"][mode_ids].astype(np.int64)      # (N, 2L, WH)
    x1 = np.einsum('nl,nlp->np', v.astype(np.int64), W1)
    p1 = (x1 + m["c1"][mode_ids][:, None]) >> m["s1"][mode_ids][:, None]
    p1 = np.where(m["clamp1"][mode_ids][:, None], np.clip(p1, 0, 255), p1)
    W2 = m["W2"][mode_ids].astype(np.int64)
    x2 = np.einsum('nl,nlp->np', v.astype(np.int64), W2)
    p2 = (x2 + m["B2"][mode_ids] * p1 + 32) >> 6
    return np.clip(p2, 0, 255).astype(np.int32)


def forward_dct2_np(res):
    n = res.shape[-1]
    log2n = n.bit_length() - 1
    t = tables.dct2_matrix(n).astype(np.int64)
    h = np.einsum('nyx,ix->nyi', res.astype(np.int64), t)
    s1 = log2n - 1
    h = (h + (1 << (s1 - 1))) >> s1
    c = np.einsum('nyi,jy->nji', h, t)
    s2 = log2n + 6
    return ((c + (1 << (s2 - 1))) >> s2).astype(np.int32)


def inverse_dct2_np(coeffs):
    n = coeffs.shape[-1]
    t = tables.dct2_matrix(n).astype(np.int64)
    v = np.einsum('nix,iy->nyx', coeffs.astype(np.int64), t)
    v = np.clip((v + 64) >> 7, -(1 << 15), (1 << 15) - 1)
    r = np.einsum('nyi,ix->nyx', v, t)
    return ((r + (1 << 11)) >> 12).astype(np.int32)


def dequantize_np(q, ls, bd_shift):
    bd_offset = (1 << bd_shift) >> 1
    d = (q.astype(np.int64) * ls + bd_offset) >> bd_shift
    return np.clip(d, -(1 << 15), (1 << 15) - 1).astype(np.int32)


def _cand_costs(tc, a, delta, ls, bd_shift, bd_offset, trailing, lam_dq):
    mag = np.where(a == 0, 0, 2 * a - delta)
    dq = (mag * ls + bd_offset) >> bd_shift
    dist = np.abs(np.abs(tc) - dq)
    bits = np.where((a == 0) & trailing, 0, a + 1)
    return 128 * dist + lam_dq[np.clip(bits, 0, 1023)].astype(np.int64), mag


def greedy_depquant_np(t, ls, bd_shift, lam_dq, log2_n):
    """Batched greedy dependent quantization -> stored q levels (B,n,n)."""
    B = t.shape[0]
    order = np.asarray(kq.coding_order(log2_n))
    tf = t.reshape(B, -1)[:, order].astype(np.int64)
    bd_offset = (1 << bd_shift) >> 1
    trans = tables.Q_STATE_TRANS
    q_state = np.zeros(B, dtype=np.int64)
    trailing = np.ones(B, dtype=bool)
    out = np.zeros_like(tf)
    for p in range(tf.shape[1]):
        tc = tf[:, p]
        delta = (q_state > 1).astype(np.int64)
        s_ = (np.abs(tc) << bd_shift) + np.where(tc < 0, bd_offset, -bd_offset)
        a0 = (s_ // ls + delta) // 2
        c0, m0 = _cand_costs(tc, a0, delta, ls, bd_shift, bd_offset,
                             trailing, lam_dq)
        c1, m1 = _cand_costs(tc, a0 + 1, delta, ls, bd_shift, bd_offset,
                             trailing, lam_dq)
        pick1 = c1 < c0
        a = np.where(tc == 0, 0, np.where(pick1, a0 + 1, a0))
        mag = np.where(tc == 0, 0, np.where(pick1, m1, m0))
        out[:, p] = np.where(tc < 0, -mag, mag)
        trailing &= a == 0
        q_state = trans[q_state, a & 1]
    q = np.zeros((B, (1 << log2_n) ** 2), dtype=np.int64)
    q[:, order] = out
    return q.reshape(t.shape).astype(np.int16)


def trellis_depquant_np(t, ls, bd_shift, lam_dq, log2_n):
    """Batched exact 8-state Viterbi (q_state x trailing), numpy."""
    B = t.shape[0]
    order = np.asarray(kq.coding_order(log2_n))
    P = len(order)
    tf = t.reshape(B, -1)[:, order].astype(np.int64)
    bd_offset = (1 << bd_shift) >> 1
    trans = tables.Q_STATE_TRANS
    BIG = np.int64(1) << 50
    q_states = (np.arange(8) >> 1).astype(np.int64)[None, :]
    trailing_s = (np.arange(8) & 1).astype(bool)[None, :]
    cost = np.full((B, 8), BIG, dtype=np.int64)
    cost[:, 1] = 0
    bp_prev = np.zeros((B, P, 8), dtype=np.int8)
    bp_mag = np.zeros((B, P, 8), dtype=np.int32)

    for p in range(P):
        tc = tf[:, p][:, None]
        is_dc = (p == P - 1)
        delta = (q_states > 1).astype(np.int64)
        s_ = (np.abs(tc) << bd_shift) + np.where(tc < 0, bd_offset, -bd_offset)
        a0 = (s_ // ls + delta) // 2
        new_cost = np.full((B, 8), BIG, dtype=np.int64)
        nb_prev = np.zeros((B, 8), dtype=np.int8)
        nb_mag = np.zeros((B, 8), dtype=np.int32)
        zero = tc == 0
        rows = np.arange(B)
        for k in (0, 1):
            a = np.where(zero, 0, a0 + k)
            mag = np.where(a == 0, 0, 2 * a - delta)
            dq = (mag * ls + bd_offset) >> bd_shift
            dist = np.abs(np.abs(tc) - dq)
            bits = np.where((a == 0) & trailing_s, 0, a + 1)
            c = 128 * dist + lam_dq[np.clip(bits, 0, 1023)].astype(np.int64)
            if is_dc:
                c = c - np.where(trailing_s & (a == 0), int(lam_dq[1]), 0)
            if k == 1:
                c = np.where(zero, BIG, c)
            nstate = trans[np.broadcast_to(q_states, a.shape), a & 1] * 2 + \
                (trailing_s & (a == 0)).astype(np.int64)
            total = cost + c
            smag = np.where(tc < 0, -mag, mag).astype(np.int32)
            for src in range(8):
                dst = nstate[:, src]
                tot = total[:, src]
                cur = new_cost[rows, dst]
                upd = tot < cur
                new_cost[rows[upd], dst[upd]] = tot[upd]
                nb_prev[rows[upd], dst[upd]] = src
                nb_mag[rows[upd], dst[upd]] = smag[upd, src]
        bp_prev[:, p] = nb_prev
        bp_mag[:, p] = nb_mag
        cost = new_cost - new_cost.min(axis=1, keepdims=True)

    state = np.argmin(cost, axis=1)
    out = np.zeros((B, P), dtype=np.int64)
    rows = np.arange(B)
    for p in range(P - 1, -1, -1):
        out[:, p] = bp_mag[rows, p, state]
        state = bp_prev[rows, p, state]
    q = np.zeros((B, (1 << log2_n) ** 2), dtype=np.int64)
    q[:, order] = out
    return q.reshape(t.shape).astype(np.int16)
