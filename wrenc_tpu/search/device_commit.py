"""Prototype on-device commit wavefront (round-3 groundwork).

Applies already-decided CU modes in dependency-rank order with EVERY
numeric stage on the TPU: reference gathering with substitution (the
static subst_gather tables read from the evolving reconstruction instead
of the original planes), 121 filtering, prediction (all modes incl. the
device CCLM kernel), forward DCT-II, greedy dependent quantization,
dequantization, inverse transform and reconstruction scatter. The host
only orders work (the same 4x4-cell dependency ranks as
WavefrontSearch._commit) and launches one jitted step per
(component, size, padded-batch) shape.

Scope: the apply-decisions commit (rd_commit=False semantics), greedy
quantizer, single/dual-tree CUs. Golden-tested bit-exact against the
NumPy rank-wavefront commit. The production re-decision commit stays in
the native C++ engine until the full device wavefront (candidate ranking
via the parallel-scan trellis) lands.
"""
import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..kernels import intra_pred, quantize as kq, refs, transforms
from ..spec import quant


def _buckets(n):
    b = 1
    while b < n:
        b <<= 1
    return b


@functools.lru_cache(maxsize=None)
def _geometry(W, H, s, c_idx, log2_ctu):
    """Static per-size tables: substitution gather rows, fill flags,
    filter indices, block scatter rows, availability masks."""
    src, fill = refs.subst_gather(W, H, s, c_idx, log2_ctu)
    pi, ni, keep = refs.filter121_indices(s)
    sh = 0 if c_idx == 0 else 1
    w = W >> sh
    xs, ys = refs.block_grid(W, H, s, c_idx)
    n_bw = w // s
    scat = (ys[:, None, None] + np.arange(s)[None, :, None]) * w \
        + (xs[:, None, None] + np.arange(s)[None, None, :])
    masks = refs.avail_masks(W, H, s, c_idx, log2_ctu)
    return (src.astype(np.int32), fill, pi, ni, keep,
            scat.reshape(len(xs), -1).astype(np.int32), n_bw, masks,
            xs.astype(np.int32), ys.astype(np.int32))


@functools.partial(jax.jit, static_argnums=(0, 1))
def _step_pred(s, c_idx, recon_flat, src, fill, pi, ni, keep, modes):
    """Gather substituted refs from the reconstruction, 121-filter, and
    predict one mode per block. recon_flat has one trailing pad slot."""
    u = jnp.where(fill, 128, recon_flat[src])            # (B, L)
    uf = jnp.where(keep[None, :], u,
                   (u[:, pi] + 2 * u + u[:, ni] + 2) >> 2)
    v = jnp.concatenate([u, uf], axis=1)
    return intra_pred.predict_modes(v, modes, s, 0 if c_idx == 0 else 1)


@functools.partial(jax.jit, static_argnums=(2,))
def _step_residual(pred, orig, log2, ls, bd_shift, lam_dq, lv):
    """DCT -> greedy dep-quant -> dequant -> inverse -> reconstruct."""
    s = 1 << log2
    pred = pred.reshape(-1, s, s).astype(jnp.int32)
    res = orig.astype(jnp.int32) - pred
    t = transforms._forward(res)
    q, _ = kq.greedy_depquant(t, ls, bd_shift, lam_dq, log2, lv)
    d = kq.dequantize(q, ls, bd_shift)
    r = transforms._inverse(d)
    rec = jnp.clip(pred + r, 0, 255)
    return rec, q


def commit_frame_device(cfg, orig_planes, cus, rate_model=None):
    """Apply decided CU modes on device in dependency-rank order.

    Returns (recon planes [Y, Cb, Cr] int32 numpy, coeffs written into
    each cu.coeffs). Bit-exact vs WavefrontSearch._commit with
    trellis_commit=False.
    """
    W, H = cfg.width, cfg.height
    rm = rate_model or cfg.rate_model
    qp = cfg.qp
    qp_c = quant.chroma_qp_from_luma(qp)
    qpar = {}
    for c in (0, 1):
        for lg in (2, 3, 4, 5):
            qpar[(c, lg)] = quant.derive_quant_params(
                qp if c == 0 else qp_c, lg, lg,
                dep_quant=cfg.dep_quant_enabled, transform_skip=False)
    lam_dq = jnp.asarray(kq.lam_dq_table(rm, qp, trellis=False))
    lv = jnp.asarray(kq.lv_table_device(rm, cfg.dep_quant_enabled, False))

    # dependency ranks over 4x4 cells (identical to WavefrontSearch._commit)
    rank_grid = np.zeros((H // 4, W // 4), dtype=np.int32)
    ranks = np.zeros(len(cus), dtype=np.int32)
    for i, cu in enumerate(cus):
        s = 1 << cu.log2
        x4, y4, n4 = cu.x // 4, cu.y // 4, max(s // 4, 1)
        r = 0
        if cu.x > 0:
            col = rank_grid[max(y4 - 1, 0):min(y4 + 2 * n4, H // 4), x4 - 1]
            if col.size:
                r = max(r, int(col.max()))
        if cu.y > 0:
            row = rank_grid[y4 - 1, max(x4 - 1, 0):min(x4 + 2 * n4, W // 4)]
            if row.size:
                r = max(r, int(row.max()))
        own = rank_grid[y4:y4 + n4, x4:x4 + n4]
        if own.size:
            r = max(r, int(own.max()))
        ranks[i] = r + 1
        region = rank_grid[y4:y4 + n4, x4:x4 + n4]
        rank_grid[y4:y4 + n4, x4:x4 + n4] = np.maximum(region, ranks[i])

    order = np.argsort(ranks, kind='stable')
    groups = {}
    for i in order:
        cu = cus[i]
        groups.setdefault((int(ranks[i]), cu.log2, cu.tree), []).append(cu)

    # device recon planes, flat with one trailing pad slot for masked
    # scatters of padded batch entries
    planes = [jnp.zeros(H * W + 1, jnp.int32),
              jnp.zeros((H // 2) * (W // 2) + 1, jnp.int32),
              jnp.zeros((H // 2) * (W // 2) + 1, jnp.int32)]
    orig = [np.asarray(p, dtype=np.int32) for p in orig_planes]

    def commit_comp(batch, c_idx, log2):
        s = 1 << log2
        sh = 0 if c_idx == 0 else 1
        (src, fill, pi, ni, keep, scat, n_bw, masks, gxs, gys) = _geometry(
            W, H, s, c_idx, cfg.log2_ctu_size)
        B = len(batch)
        Bp = _buckets(B)
        idx = np.array([((cu.y >> sh) // s) * n_bw + ((cu.x >> sh) // s)
                        for cu in batch], dtype=np.int64)
        modes = np.array([cu.luma_mode if c_idx == 0 else cu.chroma_mode
                          for cu in batch], dtype=np.int32)
        pad = Bp - B
        idx_p = np.concatenate([idx, np.repeat(idx[-1:], pad)])
        modes_p = np.concatenate([modes, np.repeat(modes[-1:], pad)])
        ob = np.stack([orig[c_idx][cu.y >> sh:(cu.y >> sh) + s,
                                   cu.x >> sh:(cu.x >> sh) + s]
                       for cu in batch])
        ob = np.concatenate([ob, np.repeat(ob[-1:], pad, 0)]) if pad else ob

        is_cclm = modes_p >= 81
        if is_cclm.any():
            # CCLM per mode (the device kernel takes one mode per call)
            preds = jnp.zeros((Bp, s, s), jnp.int32)
            for m in (81, 82, 83):
                sel = np.where(modes_p == m)[0]
                if not sel.size:
                    continue
                pm = intra_pred.predict_cclm(
                    m, planes[0][:-1].reshape(H, W),
                    planes[c_idx][:-1].reshape(H >> sh, W >> sh),
                    gxs[idx_p[sel]], gys[idx_p[sel]], s, masks[idx_p[sel]],
                    1 << cfg.log2_ctu_size)
                preds = preds.at[sel].set(pm)
            norm = np.where(~is_cclm)[0]
            if norm.size:
                pn = _step_pred(s, c_idx, planes[c_idx],
                                jnp.asarray(src[idx_p[norm]]),
                                jnp.asarray(fill[idx_p[norm], None]
                                            if fill.ndim == 1 else
                                            fill[idx_p[norm]]),
                                jnp.asarray(pi), jnp.asarray(ni),
                                jnp.asarray(keep),
                                jnp.asarray(modes_p[norm]))
                preds = preds.at[norm].set(pn.reshape(-1, s, s))
            pred = preds.reshape(Bp, -1)
        else:
            pred = _step_pred(s, c_idx, planes[c_idx],
                              jnp.asarray(src[idx_p]),
                              jnp.asarray(fill[idx_p, None]
                                          if fill.ndim == 1 else
                                          fill[idx_p]),
                              jnp.asarray(pi), jnp.asarray(ni),
                              jnp.asarray(keep), jnp.asarray(modes_p))
        qp_ = qpar[(min(c_idx, 1), log2)]
        rec, q = _step_residual(pred, jnp.asarray(ob), log2,
                                qp_.ls, qp_.bd_shift, lam_dq, lv)
        # masked scatter: padded entries write to the trailing pad slot
        rows = scat[idx_p]
        rows[B:] = (H >> sh) * (W >> sh)
        planes[c_idx] = planes[c_idx].at[rows.reshape(-1)].set(
            rec.reshape(-1))
        qh = np.asarray(q[:B]).astype(np.int16)
        for i, cu in enumerate(batch):
            cu.coeffs[c_idx] = qh[i]

    for (rank, log2, tree) in sorted(groups.keys()):
        batch = groups[(rank, log2, tree)]
        if tree in ('S', 'L'):
            commit_comp(batch, 0, log2)
        if tree in ('S', 'C'):
            commit_comp(batch, 1, log2 - 1)
            commit_comp(batch, 2, log2 - 1)

    return [np.asarray(planes[0][:-1]).reshape(H, W),
            np.asarray(planes[1][:-1]).reshape(H // 2, W // 2),
            np.asarray(planes[2][:-1]).reshape(H // 2, W // 2)]
