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


def cclm_luma_patch(luma_flat, lx, ly, cs, H, W, bfl):
    """ONE gather per block: the (4cs+2, 4cs+3) luma window at rows
    ly-2 .. ly+4cs-1, cols lx-3 .. lx+4cs-1 (edge-clipped like the spec's
    clamped reads). Every luma access CCLM makes — the 2x2 downsample
    taps, the two above rows, the three left columns — lands inside it,
    so the per-sample plane gathers that were scalar-bound on TPU
    (round-3 bottleneck 2) collapse into one patch gather plus static
    in-patch slices / small one-hot selects."""
    B = lx.shape[0]
    PH, PW = 4 * cs + 2, 4 * cs + 3
    prow = jnp.clip(ly[:, None] + jnp.arange(PH)[None, :] - 2, 0, H - 1)
    pcol = jnp.clip(lx[:, None] + jnp.arange(PW)[None, :] - 3, 0, W - 1)
    pidx = prow[:, :, None] * W + pcol[:, None, :]
    return luma_flat[bfl[:, None, None], pidx]           # (B, PH, PW)


def cclm_chroma_patch(ch_flat, xs, ys, cs, hh, hw, bf):
    """(B, 2cs+1, 2cs+1) chroma window at rows ys-1 .. ys+2cs-1, cols
    xs-1 .. xs+2cs-1 (edge-clipped): covers the above-row and left-column
    boundary samples CCLM fits the linear model on."""
    CH_, CW_ = 2 * cs + 1, 2 * cs + 1
    crow = jnp.clip(ys[:, None] + jnp.arange(CH_)[None, :] - 1, 0, hh - 1)
    ccol = jnp.clip(xs[:, None] + jnp.arange(CW_)[None, :] - 1, 0, hw - 1)
    cidx = crow[:, :, None] * hw + ccol[:, None, :]
    return ch_flat[bf[:, None, None], cidx]              # (B, CH, CW)


def _sel_cols(row, px, PW):
    """row (B, PW), px (B, 4) dynamic column picks -> (B, 4); out-of-range
    picks yield 0 (only ever produced for unused pick slots)."""
    hot = px[:, :, None] == jnp.arange(PW, dtype=jnp.int32)[None, None, :]
    return jnp.sum(jnp.where(hot, row[:, None, :], 0), axis=-1)


def predict_cclm_impl(mode, luma, chroma, xs, ys, cs, masks, ctu_size=32,
                      bf=None, bf_luma=None):
    """Batched bit-exact CCLM prediction on device — the jnp twin of
    np_ops.predict_cclm_np (spec/intra.py predict_cclm;
    intra_predictor.rs:1604-2056), golden-tested against it. cs >= 4.

    luma/chroma: full (recon) planes; (xs, ys): chroma block positions;
    masks: (B, 4*cs+1) availability rows (refs.avail_masks geometry).
    Planes may be stacked per frame ((F, H, W) / (F, h, w)) with `bf`
    giving each block's frame index — the on-device commit wavefront
    predicts CUs of a whole frame batch in one call.

    All plane reads go through one luma patch + one chroma patch per row
    (cclm_luma_patch / cclm_chroma_patch); stacked callers that evaluate
    several (mode, component) variants per block should build the patches
    once and call cclm_from_patches directly.
    """
    assert cs >= 4
    luma = luma.astype(jnp.int32)
    chroma = chroma.astype(jnp.int32)
    if luma.ndim == 2:
        luma = luma[None]
        chroma = chroma[None]
    H, W = luma.shape[1:]
    hh, hw = chroma.shape[1:]
    xs = jnp.asarray(xs, jnp.int32)
    ys = jnp.asarray(ys, jnp.int32)
    masks = jnp.asarray(masks)
    B = xs.shape[0]
    bf = jnp.zeros(B, jnp.int32) if bf is None else jnp.asarray(bf, jnp.int32)
    # chroma may be stacked (2F, h, w) with bf = 2*frame + component while
    # luma stays (F, H, W) — bf_luma then carries the luma frame index
    bfl = bf if bf_luma is None else jnp.asarray(bf_luma, jnp.int32)
    m = jnp.broadcast_to(jnp.asarray(mode, jnp.int32), (B,))
    LP = cclm_luma_patch(luma.reshape(luma.shape[0], H * W),
                         2 * xs, 2 * ys, cs, H, W, bfl)
    CP = cclm_chroma_patch(chroma.reshape(chroma.shape[0], hh * hw),
                           xs, ys, cs, hh, hw, bf)
    return cclm_from_patches(m, LP, CP, masks, 2 * ys, cs, ctu_size)


def cclm_from_patches(m, LP, CP, masks, ly, cs, ctu_size):
    """CCLM prediction from pre-gathered patches. m: (B,) modes (81/82/83);
    LP: (B, 4cs+2, 4cs+3) luma patches; CP: (B, 2cs+1, 2cs+1) chroma
    patches; masks: (B, 4cs+1); ly: (B,) luma y of each block."""
    B = m.shape[0]
    PH, PW = 4 * cs + 2, 4 * cs + 3
    tw = th = cs

    avail_l = masks[:, 1].astype(bool)
    avail_t = masks[:, 1 + 2 * cs].astype(bool)
    nbl = jnp.cumprod(masks[:, 1 + cs:1 + 2 * cs], axis=1).sum(1)
    ntr = jnp.cumprod(masks[:, 1 + 3 * cs:1 + 4 * cs], axis=1).sum(1)

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

    # ---- 2x2 downsample grid from STATIC patch slices (plane row ly+r is
    # patch row r+2; plane col lx+c is patch col c+3)
    r0 = LP[:, 2:2 + 2 * cs:2, :]                        # even luma rows
    r1 = LP[:, 3:3 + 2 * cs:2, :]                        # odd luma rows

    def cols(rr, base):
        return rr[:, :, base:base + 2 * cs:2]            # (B, cs, cs)

    xm_a = cols(r0, 2) + cols(r1, 2)
    # first downsample column: lx-1 when the left edge exists, else lx
    xm_edge = (r0[:, :, 2] + r1[:, :, 2])
    xm_self = (r0[:, :, 3] + r1[:, :, 3])
    first0 = jnp.arange(cs)[None, None, :] == 0
    xm_s = jnp.where(avail_l[:, None, None],
                     xm_edge[:, :, None], xm_self[:, :, None])
    xm_sum = jnp.where(first0, xm_s, xm_a)
    xc_sum = cols(r0, 3) + cols(r1, 3)
    xr_sum = cols(r0, 4) + cols(r1, 4)
    p_ds = (xm_sum + 2 * xc_sum + xr_sum + 4) >> 3

    # ---- boundary samples via ONE one-hot select over a concatenated
    # strip per plane (six separate row/column selects fused into one
    # keeps the rank-scan's per-step kernel count down):
    #   luma strip  = [row ly-1 | row ly-2 | col lx-3 | col lx-2 | col lx-1]
    #   chroma strip = [row ys-1 | col xs-1]
    p = pick_t
    px_c = 3 + 2 * p
    px_m = jnp.where((p > 0) | avail_l[:, None], px_c - 1, 3)
    px_r = px_c + 1
    q = pick_l
    py0 = 2 + 2 * q
    ctu_b = ((ly & (ctu_size - 1)) == 0)[:, None]
    ystrip = jnp.concatenate(
        [LP[:, 1, :], LP[:, 0, :], LP[:, :, 0], LP[:, :, 1], LP[:, :, 2]],
        axis=1)
    o_rb, o_c3, o_c2, o_c1 = PW, 2 * PW, 2 * PW + PH, 2 * PW + 2 * PH
    yidx = jnp.concatenate(
        [px_m, px_c, px_r,                                  # ra (ly-1)
         px_m + o_rb, px_c + o_rb, px_r + o_rb,             # rb (ly-2)
         py0 + o_c3, py0 + 1 + o_c3,
         py0 + o_c2, py0 + 1 + o_c2,
         py0 + o_c1, py0 + 1 + o_c1], axis=1)               # (B, 48)
    ysel = _sel_cols(ystrip, yidx, 2 * PW + 3 * PH).reshape(B, 12, 4)
    sm_a, sc_a, sr_a, sm_b, sc_b, sr_b = (ysel[:, i] for i in range(6))
    sel_norm = (sm_a + sm_b + 2 * sc_a + 2 * sc_b + sr_a + sr_b + 4) >> 3
    sel_bdry = (sm_a + 2 * sc_a + sr_a + 2) >> 2
    sel_y_t = jnp.where(ctu_b, sel_bdry, sel_norm)
    sel_y_l = (ysel[:, 6] + ysel[:, 7] + 2 * ysel[:, 8] + 2 * ysel[:, 9]
               + ysel[:, 10] + ysel[:, 11] + 4) >> 3
    CW_ = 2 * cs + 1
    cstrip = jnp.concatenate([CP[:, 0, :], CP[:, :, 0]], axis=1)
    cidx = jnp.concatenate([1 + p, 1 + q + CW_], axis=1)    # (B, 8)
    csel = _sel_cols(cstrip, cidx, 2 * CW_).reshape(B, 2, 4)
    sel_c_t, sel_c_l = csel[:, 0], csel[:, 1]

    j = jnp.arange(4)[None, :]
    from_top = j < cnt_t[:, None]
    li = jnp.clip(j - cnt_t[:, None], 0, 3)
    sel_y = jnp.where(from_top, sel_y_t, _sel_cols(sel_y_l, li, 4))
    sel_c = jnp.where(from_top, sel_c_t, _sel_cols(sel_c_l, li, 4))
    return _cclm_fit_predict(sel_y, sel_c, p_ds, empty)


def cclm_strips(luma_flat, lx, ly, cs, H, W, bfl):
    """Thin boundary strips for cclm_from_own (B blocks): top strip
    (B, 2, 4cs+1) = plane rows ly-2/ly-1, cols lx-1 .. lx+4cs-1; left
    strip (B, 4cs, 3) = rows ly .. ly+4cs-1, cols lx-3 .. lx-1; lcol
    (B, 2cs) = col lx-1, rows ly .. ly+2cs-1 (the downsample's left
    taps). All edge-clipped like the spec's clamped reads."""
    TW = 4 * cs + 1
    tr = jnp.clip(ly[:, None] + jnp.arange(2)[None, :] - 2, 0, H - 1)
    tcl = jnp.clip(lx[:, None] + jnp.arange(TW)[None, :] - 1, 0, W - 1)
    tstrip = luma_flat[bfl[:, None, None],
                       tr[:, :, None] * W + tcl[:, None, :]]
    LH = 4 * cs
    lr = jnp.clip(ly[:, None] + jnp.arange(LH)[None, :], 0, H - 1)
    lcl = jnp.clip(lx[:, None] + jnp.arange(3)[None, :] - 3, 0, W - 1)
    lstrip = luma_flat[bfl[:, None, None],
                       lr[:, :, None] * W + lcl[:, None, :]]
    ccol = jnp.clip(lx - 1, 0, W - 1)
    rr = jnp.clip(ly[:, None] + jnp.arange(2 * cs)[None, :], 0, H - 1)
    lcol = luma_flat[bfl[:, None], rr * W + ccol[:, None]]
    return tstrip, lstrip, lcol


def cclm_cstrips(ch_flat, xs, ys, cs, hh, hw, bf):
    """Chroma boundary strips: top row ys-1 cols xs .. xs+2cs-1 and left
    col xs-1 rows ys .. ys+2cs-1, each (B, 2cs), edge-clipped."""
    tcols = jnp.clip(xs[:, None] + jnp.arange(2 * cs)[None, :], 0, hw - 1)
    trow = jnp.clip(ys - 1, 0, hh - 1)
    ct = ch_flat[bf[:, None], trow[:, None] * hw + tcols]
    lrows = jnp.clip(ys[:, None] + jnp.arange(2 * cs)[None, :], 0, hh - 1)
    lcolc = jnp.clip(xs - 1, 0, hw - 1)
    cl = ch_flat[bf[:, None], lrows * hw + lcolc[:, None]]
    return ct, cl


def cclm_from_own(m, own, lcol, tstrip, lstrip, ct, cl_, masks, ly, cs,
                  ctu_size):
    """CCLM prediction reading the block's OWN luma from a dense array.

    The commit wavefront evaluates CCLM in the same step that committed
    the co-located luma, so the (2cs, 2cs) luma is still dense in
    registers (`own`) — only the thin boundary strips (cclm_strips /
    cclm_cstrips) touch the reconstruction planes, cutting the gathered
    elements ~6-9x vs full patches. Bit-identical to cclm_from_patches.

    m: (B,) modes; own: (B, 2cs, 2cs); lcol/tstrip/lstrip/ct/cl_ from
    the strip helpers; masks: (B, 4cs+1); ly: (B,) luma y."""
    B = m.shape[0]
    TW, LH = 4 * cs + 1, 4 * cs
    tw = th = cs

    avail_l = masks[:, 1].astype(bool)
    avail_t = masks[:, 1 + 2 * cs].astype(bool)
    nbl = jnp.cumprod(masks[:, 1 + cs:1 + 2 * cs], axis=1).sum(1)
    ntr = jnp.cumprod(masks[:, 1 + 3 * cs:1 + 4 * cs], axis=1).sum(1)
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

    # ---- 2x2 downsample from the dense own-luma + the left column
    own = own.reshape(B, 2 * cs, 2 * cs)
    r0 = own[:, 0::2, :]
    r1 = own[:, 1::2, :]
    rsum = r0 + r1                                       # (B, cs, 2cs)
    xc_sum = rsum[:, :, 0::2]
    xr_sum = rsum[:, :, 1::2]
    lc_sum = lcol[:, 0::2] + lcol[:, 1::2]               # (B, cs)
    xm0 = jnp.where(avail_l[:, None], lc_sum, xc_sum[:, :, 0])
    xm_sum = jnp.concatenate(
        [xm0[:, :, None], xr_sum[:, :, :-1]], axis=2)
    p_ds = (xm_sum + 2 * xc_sum + xr_sum + 4) >> 3

    # ---- boundary selects on the concatenated strips (ONE one-hot):
    # [top row ly-1 | top row ly-2 | left c3 | left c2 | left c1]
    p = pick_t
    px_c = 1 + 2 * p                                     # strip col of txc
    px_m = jnp.where((p > 0) | avail_l[:, None], 2 * p, 1)
    px_r = px_c + 1
    q = pick_l
    py0 = 2 * q
    ctu_b = ((ly & (ctu_size - 1)) == 0)[:, None]
    ystrip = jnp.concatenate(
        [tstrip[:, 1, :], tstrip[:, 0, :],
         lstrip[:, :, 0], lstrip[:, :, 1], lstrip[:, :, 2]], axis=1)
    o_rb, o_c3 = TW, 2 * TW
    o_c2, o_c1 = 2 * TW + LH, 2 * TW + 2 * LH
    yidx = jnp.concatenate(
        [px_m, px_c, px_r,
         px_m + o_rb, px_c + o_rb, px_r + o_rb,
         py0 + o_c3, py0 + 1 + o_c3,
         py0 + o_c2, py0 + 1 + o_c2,
         py0 + o_c1, py0 + 1 + o_c1], axis=1)
    ysel = _sel_cols(ystrip, yidx, 2 * TW + 3 * LH).reshape(B, 12, 4)
    sm_a, sc_a, sr_a, sm_b, sc_b, sr_b = (ysel[:, i] for i in range(6))
    sel_norm = (sm_a + sm_b + 2 * sc_a + 2 * sc_b + sr_a + sr_b + 4) >> 3
    sel_bdry = (sm_a + 2 * sc_a + sr_a + 2) >> 2
    sel_y_t = jnp.where(ctu_b, sel_bdry, sel_norm)
    sel_y_l = (ysel[:, 6] + ysel[:, 7] + 2 * ysel[:, 8] + 2 * ysel[:, 9]
               + ysel[:, 10] + ysel[:, 11] + 4) >> 3
    cstrip = jnp.concatenate([ct, cl_], axis=1)
    cidx = jnp.concatenate([p, q + 2 * cs], axis=1)
    csel = _sel_cols(cstrip, cidx, 4 * cs).reshape(B, 2, 4)
    sel_c_t, sel_c_l = csel[:, 0], csel[:, 1]

    j = jnp.arange(4)[None, :]
    from_top = j < cnt_t[:, None]
    li = jnp.clip(j - cnt_t[:, None], 0, 3)
    sel_y = jnp.where(from_top, sel_y_t, _sel_cols(sel_y_l, li, 4))
    sel_c = jnp.where(from_top, sel_c_t, _sel_cols(sel_c_l, li, 4))
    return _cclm_fit_predict(sel_y, sel_c, p_ds, empty)


def _cclm_fit_predict(sel_y, sel_c, p_ds, empty):
    """Linear-model fit + prediction from the 4 selected (luma, chroma)
    boundary pairs (intra_predictor.rs:1830-2056)."""
    # 4-point min/max network (exact spec comparison/swap order),
    # value-tracked: (y, c) pairs swap together, no index indirection
    ymn0, ymx0, ymn1, ymx1 = (sel_y[:, i] for i in range(4))
    cmn0, cmx0, cmn1, cmx1 = (sel_c[:, i] for i in range(4))

    def swp(sw, a, b):
        return jnp.where(sw, b, a), jnp.where(sw, a, b)

    sw = ymn0 > ymn1
    ymn0, ymn1 = swp(sw, ymn0, ymn1)
    cmn0, cmn1 = swp(sw, cmn0, cmn1)
    sw = ymx0 > ymx1
    ymx0, ymx1 = swp(sw, ymx0, ymx1)
    cmx0, cmx1 = swp(sw, cmx0, cmx1)
    sw = ymn0 > ymx1
    ymn0, ymx0 = swp(sw, ymn0, ymx0)
    cmn0, cmx0 = swp(sw, cmn0, cmx0)
    ymn1, ymx1 = swp(sw, ymn1, ymx1)
    cmn1, cmx1 = swp(sw, cmn1, cmx1)
    sw = ymn1 > ymx0
    ymn1, ymx0 = swp(sw, ymn1, ymx0)
    cmn1, cmx0 = swp(sw, cmn1, cmx0)

    max_y = (ymx0 + ymx1 + 1) >> 1
    max_c = (cmx0 + cmx1 + 1) >> 1
    min_y = (ymn0 + ymn1 + 1) >> 1
    min_c = (cmn0 + cmn1 + 1) >> 1

    diff = max_y - min_y
    diff_c = max_c - min_c
    x_ = _ilog2_u8(diff)
    norm = ((diff << 4) >> jnp.maximum(x_, 0)) & 15
    x_ = x_ + (norm != 0)
    y_ = jnp.where(jnp.abs(diff_c) > 0, _ilog2_u8(jnp.abs(diff_c)) + 1, 0)
    y_s = jnp.maximum(y_, 1)
    # 16-entry reciprocal LUT as a one-hot select (per-element gathers over
    # a minor axis lower to scalar loops on TPU)
    sig = jnp.asarray(np.asarray(tables.CCLM_DIV_SIG_TABLE, np.int32))
    tbl = jnp.sum(jnp.where(norm[:, None] == jnp.arange(16)[None, :],
                            sig[None, :], 0), axis=-1) | 8
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
