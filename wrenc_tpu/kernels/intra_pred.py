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


@functools.lru_cache(maxsize=None)
def _mats_device(size, c_idx):
    # numpy arrays: safe to embed as constants from inside any jit trace
    return intra_mats.build_mode_matrices(size, c_idx)


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
                    preferred_element_type=jnp.float32).astype(jnp.int32)
    p1 = (x1 + m["c1"][None, :, None]) >> m["s1"][None, :, None]
    p1 = jnp.where(m["clamp1"][None, :, None], jnp.clip(p1, 0, 255), p1)
    x2 = jnp.einsum('nl,mlp->nmp', vf, m["W2"].astype(jnp.float32),
                    preferred_element_type=jnp.float32).astype(jnp.int32)
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
                    preferred_element_type=jnp.float32).astype(jnp.int32)
    c1 = m["c1"][mode_ids][:, None]
    s1 = m["s1"][mode_ids][:, None]
    p1 = (x1 + c1) >> s1
    p1 = jnp.where(m["clamp1"][mode_ids][:, None], jnp.clip(p1, 0, 255), p1)
    x2 = jnp.einsum('nl,nlp->np', vf, W2,
                    preferred_element_type=jnp.float32).astype(jnp.int32)
    p2 = (x2 + m["B2"][mode_ids] * p1 + 32) >> 6
    return jnp.clip(p2, 0, 255)
