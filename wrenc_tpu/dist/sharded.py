"""Multi-chip sharding of the encode compute step.

Decomposition axes (SURVEY.md §2.3: the codec analogs of dp/sp):
- `frame`: all-intra frames are independent -> pure data parallelism.
- `row`:   bands of CTU rows within a frame; intra prediction needs one
           halo row of samples from the band above, exchanged with
           `jax.lax.ppermute` over the mesh's row axis (ICI traffic only).

The sharded step runs the stage-A mode-decision compute (all-mode matmul
sweep + SAD + greedy dep-quant RD) on each (frame, row-band) shard via
shard_map; outputs are per-block best modes and costs.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..kernels import intra_pred, quantize as kq, transforms


def make_mesh(devices=None, frame_axis=None):
    """Build a (frame, row) mesh from available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if frame_axis is None:
        # favour a square-ish factorization
        frame_axis = 1
        for f in range(int(np.sqrt(n)), 0, -1):
            if n % f == 0:
                frame_axis = f
                break
    rows = n // frame_axis
    dev = np.array(devices[:frame_axis * rows]).reshape(frame_axis, rows)
    return Mesh(dev, ("frame", "row"))


def _band_modes(y_band, halo_row, size, ls, bd_shift, lam_dq, lv):
    """Best mode per aligned block in one row band.

    y_band: (F, Hb, W) int32; halo_row: (F, 1, W) from the band above.
    """
    F, Hb, W = y_band.shape
    padded = jnp.concatenate([halo_row, y_band], axis=1)     # (F, Hb+1, W)
    n_by, n_bx = Hb // size, W // size
    log2 = size.bit_length() - 1

    # unified ref vectors for all blocks: corner + left col + above row
    # (edge-replicated at the frame border; decision-only compute)
    left_pad = jnp.concatenate([padded[:, :, :1], padded], axis=2)
    bx = jnp.arange(n_bx) * size
    by = jnp.arange(n_by) * size

    def block_refs(f):
        p = left_pad[f]                                      # (Hb+1, W+1)
        def one(yx):
            y0, x0 = yx
            corner = p[y0, x0][None]
            left = jax.lax.dynamic_slice(p, (y0 + 1, x0), (2 * size, 1))[:, 0]
            above = jax.lax.dynamic_slice(p, (y0, x0 + 1), (1, 2 * size))[0]
            return jnp.concatenate([corner, left, above])
        yy, xx = jnp.meshgrid(by, bx, indexing="ij")
        yx = jnp.stack([yy.ravel(), xx.ravel()], axis=1)
        return jax.vmap(one)(yx)                             # (N, L)

    u = jax.vmap(block_refs)(jnp.arange(F))                  # (F, N, L)
    N = n_by * n_bx
    u = u.reshape(F * N, -1)
    v = jnp.concatenate([u, u], axis=1)                      # unfiltered v
    pred = intra_pred._predict_all_modes(v, size, 0)         # (FN, 67, WH)
    blocks = y_band.reshape(F, n_by, size, n_bx, size) \
        .transpose(0, 1, 3, 2, 4).reshape(F * N, size * size)
    sad = jnp.abs(pred - blocks[:, None, :]).sum(-1)
    best = jnp.argmin(sad, axis=1).astype(jnp.int32)
    bp = jnp.take_along_axis(pred, best[:, None, None], axis=1)[:, 0]
    res = (blocks - bp).reshape(-1, size, size)
    t = transforms._forward(res)
    q, rate = kq.greedy_depquant(t, ls, bd_shift, lam_dq, log2, lv)
    cost = sad.min(axis=1).astype(jnp.float32) + rate
    return best.reshape(F, N), cost.reshape(F, N)


def sharded_search_step(mesh, size=8):
    """Build the jitted multi-chip search step over `mesh`.

    Input: y planes (F, H, W) int32, F divisible by the frame axis, H (in
    rows) divisible by row axis. Output: per-block (modes, costs).
    """
    from ..core.config import RateModelConfig
    rm = RateModelConfig()
    lam_dq = kq.lam_dq_table(rm, 32, trellis=False)
    lv = kq.lv_table_device(rm, True, False)
    from ..spec import quant
    qpar = quant.derive_quant_params(32, 3, 3, dep_quant=True,
                                     transform_skip=False)
    nrow = mesh.shape["row"]

    def step(y):
        def band(y_local):
            # halo: last pixel row of each band -> band below
            last = y_local[:, -1:, :]
            perm = [(i, i + 1) for i in range(nrow - 1)]
            halo = jax.lax.ppermute(last, "row", perm)
            return _band_modes(y_local, halo, size, qpar.ls, qpar.bd_shift,
                               jnp.asarray(lam_dq), jnp.asarray(lv))
        try:
            f = shard_map(band, mesh=mesh,
                          in_specs=P("frame", "row", None),
                          out_specs=(P("frame", "row"), P("frame", "row")),
                          check_vma=False)
        except TypeError:  # older jax: check_rep
            f = shard_map(band, mesh=mesh,
                          in_specs=P("frame", "row", None),
                          out_specs=(P("frame", "row"), P("frame", "row")),
                          check_rep=False)
        return f(y)

    return jax.jit(step)
