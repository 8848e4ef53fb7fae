"""Batched intra prediction on TPU: the 67-mode sweep as two int32 matmuls.

p  = clip((v @ W1 + c1) >> s1);  p' = clip((v @ W2 + B*p + 32) >> 6)

with v = [u, filter121(u)] per block. Bit-exact vs spec/intra.py (golden
tests); runs on MXU via jnp.einsum with int32 accumulation.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import intra_mats
from .transforms import EXACT
from ..core import tables


@functools.lru_cache(maxsize=None)
def _mats_device(size, c_idx):
    # numpy arrays: safe to embed as constants from inside any jit trace
    return intra_mats.build_mode_matrices(size, c_idx)


@functools.lru_cache(maxsize=None)
def mats_host_f32(size, c_idx):
    """Mode matrices with W1/W2 pre-cast to f32 — for passing as TRACED
    ARGUMENTS to a jit instead of embedding ~180 MB of constants in the
    program (the axon remote compiler chokes on constant-heavy programs;
    device-resident parameters also dedupe across executables)."""
    m = intra_mats.build_mode_matrices(size, c_idx)
    return {"W1": m["W1"].astype(np.float32),
            "W2": m["W2"].astype(np.float32),
            "c1": m["c1"], "s1": m["s1"], "clamp1": m["clamp1"],
            "B2": m["B2"]}


_MATS_DEV_CACHE = {}


def mats_device_f32(size, c_idx):
    """Device-resident f32 mode matrices (one transfer per process)."""
    key = (size, c_idx)
    if key not in _MATS_DEV_CACHE:
        _MATS_DEV_CACHE[key] = jax.device_put(mats_host_f32(size, c_idx))
    return _MATS_DEV_CACHE[key]


def predict_all_modes_m(v, m, size):
    """67-mode sweep with the matrices as traced arguments.
    v: (N, 2L) int32, m: dict from mats_host_f32 -> (N, 67, WH) int32."""
    vf = v.astype(jnp.float32)
    x1 = jnp.einsum('nl,mlp->nmp', vf, m["W1"],
                    preferred_element_type=jnp.float32,
                    precision=EXACT).astype(jnp.int32)
    p1 = (x1 + m["c1"][None, :, None]) >> m["s1"][None, :, None]
    p1 = jnp.where(m["clamp1"][None, :, None], jnp.clip(p1, 0, 255), p1)
    x2 = jnp.einsum('nl,mlp->nmp', vf, m["W2"],
                    preferred_element_type=jnp.float32,
                    precision=EXACT).astype(jnp.int32)
    p2 = (x2 + m["B2"][None, :, :] * p1 + 32) >> 6
    return jnp.clip(p2, 0, 255)


def predict_modes_m(v, mode_ids, m):
    """Per-block single-mode prediction with traced matrices.
    v: (N, 2L), mode_ids: (N,) -> (N, WH) int32."""
    W1 = m["W1"][mode_ids]                         # (N, 2L, WH) f32
    W2 = m["W2"][mode_ids]
    vf = v.astype(jnp.float32)
    x1 = jnp.einsum('nl,nlp->np', vf, W1,
                    preferred_element_type=jnp.float32,
                    precision=EXACT).astype(jnp.int32)
    p1 = (x1 + m["c1"][mode_ids][:, None]) >> m["s1"][mode_ids][:, None]
    p1 = jnp.where(m["clamp1"][mode_ids][:, None], jnp.clip(p1, 0, 255), p1)
    x2 = jnp.einsum('nl,nlp->np', vf, W2,
                    preferred_element_type=jnp.float32,
                    precision=EXACT).astype(jnp.int32)
    p2 = (x2 + m["B2"][mode_ids] * p1 + 32) >> 6
    return jnp.clip(p2, 0, 255)


def make_v(u, size):
    """v = [u, filtered(u)] (N, 2L) int32 (host-side numpy)."""
    uf = intra_mats.filter_ref_vector(u, size)
    return np.concatenate([u, uf], axis=1).astype(np.int32)


def predict_all_modes(v, size, c_idx):
    """v: (N, 2L) int32 -> predictions (N, 67, WH) int32."""
    return _predict_all_modes(v, size, c_idx)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _predict_all_modes(v, size, c_idx):
    # All per-pixel sums are < 2^24, so f32 matmuls are EXACT and run on the
    # MXU (int32 dot does not).
    m = {k: (jnp.asarray(a) if isinstance(a, np.ndarray) else a)
         for k, a in _mats_device(size, c_idx).items()}
    vf = v.astype(jnp.float32)
    x1 = jnp.einsum('nl,mlp->nmp', vf, m["W1"].astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                    precision=EXACT).astype(jnp.int32)
    p1 = (x1 + m["c1"][None, :, None]) >> m["s1"][None, :, None]
    p1 = jnp.where(m["clamp1"][None, :, None], jnp.clip(p1, 0, 255), p1)
    x2 = jnp.einsum('nl,mlp->nmp', vf, m["W2"].astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                    precision=EXACT).astype(jnp.int32)
    p2 = (x2 + m["B2"][None, :, :] * p1 + 32) >> 6
    return jnp.clip(p2, 0, 255)


def predict_modes(v, mode_ids, size, c_idx):
    """Per-block single-mode prediction: v (N, 2L), mode_ids (N,) ->
    (N, WH) int32. Used by the commit pass."""
    return _predict_modes(v, mode_ids, size, c_idx)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _predict_modes(v, mode_ids, size, c_idx):
    m = {k: (jnp.asarray(a) if isinstance(a, np.ndarray) else a)
         for k, a in _mats_device(size, c_idx).items()}
    W1 = m["W1"][mode_ids].astype(jnp.float32)     # (N, 2L, WH)
    W2 = m["W2"][mode_ids].astype(jnp.float32)
    vf = v.astype(jnp.float32)
    x1 = jnp.einsum('nl,nlp->np', vf, W1,
                    preferred_element_type=jnp.float32,
                    precision=EXACT).astype(jnp.int32)
    c1 = m["c1"][mode_ids][:, None]
    s1 = m["s1"][mode_ids][:, None]
    p1 = (x1 + c1) >> s1
    p1 = jnp.where(m["clamp1"][mode_ids][:, None], jnp.clip(p1, 0, 255), p1)
    x2 = jnp.einsum('nl,nlp->np', vf, W2,
                    preferred_element_type=jnp.float32,
                    precision=EXACT).astype(jnp.int32)
    p2 = (x2 + m["B2"][mode_ids] * p1 + 32) >> 6
    return jnp.clip(p2, 0, 255)


def _ilog2_u8(v):
    """floor(log2(v)) for int arrays with 0 <= v <= 255 (0 -> 0), exact
    integer formulation (comparison ladder; no float log)."""
    v = jnp.maximum(v, 1)
    return sum((v >= (1 << b)).astype(jnp.int32) for b in range(1, 9))


@functools.partial(jax.jit, static_argnums=(0, 5, 7))
def predict_cclm(mode, luma, chroma, xs, ys, cs, masks, ctu_size=32,
                 bf=None):
    return predict_cclm_impl(mode, luma, chroma, xs, ys, cs, masks,
                             ctu_size, bf)


def predict_cclm_impl(mode, luma, chroma, xs, ys, cs, masks, ctu_size=32,
                      bf=None, bf_luma=None):
    """Batched bit-exact CCLM prediction on device — the jnp twin of
    np_ops.predict_cclm_np (spec/intra.py predict_cclm;
    intra_predictor.rs:1604-2056), golden-tested against it. One mode
    (81 LT / 82 L / 83 T) for the whole batch; cs >= 4.

    luma/chroma: full (recon) planes; (xs, ys): chroma block positions;
    masks: (B, 4*cs+1) availability rows (refs.avail_masks geometry).
    Planes may be stacked per frame ((F, H, W) / (F, h, w)) with `bf`
    giving each block's frame index — the on-device commit wavefront
    predicts CUs of a whole frame batch in one call.
    Completes the device kernel set needed by an on-device commit
    wavefront (every other prediction mode already runs on device).
    """
    assert cs >= 4
    luma = luma.astype(jnp.int32)
    chroma = chroma.astype(jnp.int32)
    if luma.ndim == 2:
        luma = luma[None]
        chroma = chroma[None]
    H, W = luma.shape[1:]
    xs = jnp.asarray(xs, jnp.int32)
    ys = jnp.asarray(ys, jnp.int32)
    masks = jnp.asarray(masks)
    B = xs.shape[0]
    bf = jnp.zeros(B, jnp.int32) if bf is None else jnp.asarray(bf, jnp.int32)
    # chroma may be stacked (2F, h, w) with bf = 2*frame + component while
    # luma stays (F, H, W) — bf_luma then carries the luma frame index
    bfl = bf if bf_luma is None else jnp.asarray(bf_luma, jnp.int32)

    def _bx(yy):
        return jnp.broadcast_to(bfl.reshape((B,) + (1,) * (yy.ndim - 1)),
                                yy.shape)
    lx, ly = 2 * xs, 2 * ys
    tw = th = cs

    avail_l = masks[:, 1].astype(bool)
    avail_t = masks[:, 1 + 2 * cs].astype(bool)
    nbl = jnp.cumprod(masks[:, 1 + cs:1 + 2 * cs], axis=1).sum(1)
    ntr = jnp.cumprod(masks[:, 1 + 3 * cs:1 + 4 * cs], axis=1).sum(1)

    # mode may be a static int or a per-block (B,) array (the commit scan
    # evaluates all three CCLM modes in ONE call)
    m = jnp.broadcast_to(jnp.asarray(mode, jnp.int32), (B,))
    is81, is82, is83 = m == 81, m == 82, m == 83
    num_t = jnp.where(is82, 0, jnp.where(
        avail_t, tw + jnp.where(is83, jnp.minimum(ntr, th), 0), 0))
    num_l = jnp.where(is83, 0, jnp.where(
        avail_l, th + jnp.where(is82, jnp.minimum(nbl, tw), 0), 0))
    empty = (num_t == 0) & (num_l == 0)
    num4 = (~(avail_t & avail_l & is81)).astype(jnp.int32)

    def picks(num):
        start = num >> (2 + num4)
        step = jnp.maximum(num >> (1 + num4), 1)
        cnt = jnp.minimum((1 + num4) << 1, num)
        j = jnp.arange(4)[None, :]
        return cnt, start[:, None] + j * step[:, None]

    cnt_t, pick_t = picks(num_t)
    cnt_l, pick_l = picks(num_l)

    def gl(yy, xx):
        yy, xx = jnp.broadcast_arrays(yy, xx)
        return luma[_bx(yy), jnp.clip(yy, 0, H - 1), jnp.clip(xx, 0, W - 1)]

    xg = jnp.arange(cs)[None, :]
    yg = jnp.arange(cs)[:, None]
    xc = lx[:, None, None] + 2 * xg[None]
    xm = xc - 1
    xm0 = jnp.where(avail_l, lx - 1, lx)
    xm = jnp.where(xg[None] == 0, xm0[:, None, None], xm)
    xr = xc + 1
    r0 = ly[:, None, None] + 2 * yg[None]
    r1 = r0 + 1
    p_ds = (gl(r0, xm) + gl(r1, xm) + 2 * gl(r0, xc) + 2 * gl(r1, xc)
            + gl(r0, xr) + gl(r1, xr) + 4) >> 3

    p = pick_t
    txc = lx[:, None] + 2 * p
    txm = jnp.where((p > 0) | avail_l[:, None], txc - 1, lx[:, None])
    txr = txc + 1
    ra = (ly - 1)[:, None]
    rb = (ly - 2)[:, None]
    ctu_b = ((ly & (ctu_size - 1)) == 0)[:, None]
    sel_norm = (gl(ra, txm) + gl(rb, txm) + 2 * gl(ra, txc)
                + 2 * gl(rb, txc) + gl(ra, txr) + gl(rb, txr) + 4) >> 3
    sel_bdry = (gl(ra, txm) + 2 * gl(ra, txc) + gl(ra, txr) + 2) >> 2
    sel_y_t = jnp.where(ctu_b, sel_bdry, sel_norm)
    sel_c_t = chroma[bf[:, None], jnp.clip(ys - 1, 0, None)[:, None],
                     jnp.clip(xs[:, None] + p, 0, W // 2 - 1)]

    q = pick_l
    lr0 = ly[:, None] + 2 * q
    lr1 = lr0 + 1
    c1_ = jnp.clip(lx - 1, 0, None)[:, None]
    c2_ = jnp.clip(lx - 2, 0, None)[:, None]
    c3_ = jnp.clip(lx - 3, 0, None)[:, None]
    sel_y_l = (gl(lr0, c3_) + gl(lr1, c3_) + 2 * gl(lr0, c2_)
               + 2 * gl(lr1, c2_) + gl(lr0, c1_) + gl(lr1, c1_) + 4) >> 3
    sel_c_l = chroma[bf[:, None], jnp.clip(ys[:, None] + q, 0, H // 2 - 1),
                     jnp.clip(xs - 1, 0, None)[:, None]]

    j = jnp.arange(4)[None, :]
    from_top = j < cnt_t[:, None]
    li = jnp.clip(j - cnt_t[:, None], 0, 3)
    rows = jnp.arange(B)[:, None]
    sel_y = jnp.where(from_top, sel_y_t, sel_y_l[rows, li])
    sel_c = jnp.where(from_top, sel_c_t, sel_c_l[rows, li])

    # 4-point min/max network (exact spec comparison/swap order)
    mn0 = jnp.zeros(B, jnp.int32)
    mn1 = jnp.full(B, 2, jnp.int32)
    mx0 = jnp.ones(B, jnp.int32)
    mx1 = jnp.full(B, 3, jnp.int32)
    r = jnp.arange(B)

    def g(idx):
        return sel_y[r, idx]

    sw = g(mn0) > g(mn1)
    mn0, mn1 = jnp.where(sw, mn1, mn0), jnp.where(sw, mn0, mn1)
    sw = g(mx0) > g(mx1)
    mx0, mx1 = jnp.where(sw, mx1, mx0), jnp.where(sw, mx0, mx1)
    sw = g(mn0) > g(mx1)
    mn0, mx0 = jnp.where(sw, mx0, mn0), jnp.where(sw, mn0, mx0)
    mn1, mx1 = jnp.where(sw, mx1, mn1), jnp.where(sw, mn1, mx1)
    sw = g(mn1) > g(mx0)
    mn1, mx0 = jnp.where(sw, mx0, mn1), jnp.where(sw, mn1, mx0)

    max_y = (g(mx0) + g(mx1) + 1) >> 1
    max_c = (sel_c[r, mx0] + sel_c[r, mx1] + 1) >> 1
    min_y = (g(mn0) + g(mn1) + 1) >> 1
    min_c = (sel_c[r, mn0] + sel_c[r, mn1] + 1) >> 1

    diff = max_y - min_y
    diff_c = max_c - min_c
    x_ = _ilog2_u8(diff)
    norm = ((diff << 4) >> jnp.maximum(x_, 0)) & 15
    x_ = x_ + (norm != 0)
    y_ = jnp.where(jnp.abs(diff_c) > 0, _ilog2_u8(jnp.abs(diff_c)) + 1, 0)
    y_s = jnp.maximum(y_, 1)
    tbl = jnp.asarray(tables.CCLM_DIV_SIG_TABLE)[norm] | 8
    a0 = jnp.where(diff_c == 0, 0,
                   (diff_c * tbl + (1 << jnp.maximum(y_ - 1, 0))) >> y_s)
    low_k = (3 + x_ - y_) < 1
    a = jnp.where(low_k, jnp.sign(a0) * 15, a0)
    k = jnp.where(low_k, 1, 3 + x_ - y_)
    b = min_c - ((a * min_y) >> k)
    a = jnp.where(diff == 0, 0, a)
    k = jnp.where(diff == 0, 0, k)
    b = jnp.where(diff == 0, min_c, b)

    pred = ((p_ds * a[:, None, None]) >> k[:, None, None]) + b[:, None, None]
    pred = jnp.clip(pred, 0, 255)
    return jnp.where(empty[:, None, None], 128, pred).astype(jnp.int32)
