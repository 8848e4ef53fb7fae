"""Batched integer transforms on TPU (DCT-II path).

Exact int32 arithmetic (jnp dot with int32 accumulation); bit-exact vs
spec/transform.py. Shapes: blocks (N, n, n).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import tables

COEFF_MIN = -(1 << 15)
COEFF_MAX = (1 << 15) - 1


@functools.lru_cache(maxsize=None)
def _dct2(n):
    # numpy: becomes a compile-time constant inside jit traces
    return tables.dct2_matrix(n).astype(np.int32)


def forward_dct2(res):
    return _forward(res)


def _f32mm(a, spec, t):
    """Exact int matmul on the MXU: operands small enough for f32."""
    return jnp.einsum(spec, a.astype(jnp.float32), t.astype(jnp.float32),
                      preferred_element_type=jnp.float32).astype(jnp.int32)


def _f32mm_split(a, spec, t, bits=9):
    """Exact int matmul with a hi/lo split (sums may exceed 2^24)."""
    lo = a & ((1 << bits) - 1)
    hi = a >> bits          # arithmetic shift keeps hi*2^bits + lo == a
    chi = _f32mm(hi, spec, t)
    clo = _f32mm(lo, spec, t)
    return (chi << bits) + clo


@jax.jit
def _forward(res):
    n = res.shape[-1]
    log2n = n.bit_length() - 1
    t = jnp.asarray(_dct2(n))
    # horizontal: H[y,i] = sum_x T[i,x] res[y,x] — sums < 2^24, f32 exact
    h = _f32mm(res.astype(jnp.int32), 'nyx,ix->nyi', t)
    s1 = log2n - 1
    h = (h + (1 << (s1 - 1))) >> s1
    # vertical: C[i,x] = sum_y T[i,y] H[y,x] — needs the hi/lo split
    c = _f32mm_split(h, 'nyi,jy->nji', t)
    s2 = log2n + 6
    return (c + (1 << (s2 - 1))) >> s2


def inverse_dct2(coeffs):
    return _inverse(coeffs)


@jax.jit
def _inverse(coeffs):
    n = coeffs.shape[-1]
    t = jnp.asarray(_dct2(n))
    # vertical: V[y,x] = sum_i T[i,y] C[i,x]
    v = _f32mm_split(coeffs.astype(jnp.int32), 'nix,iy->nyx', t)
    v = jnp.clip((v + 64) >> 7, COEFF_MIN, COEFF_MAX)
    # horizontal: R[y,x] = sum_i T[i,x] V[y,i]
    r = _f32mm_split(v, 'nyi,ix->nyx', t)
    bd_shift = 12  # 20 - bit_depth(8)
    return (r + (1 << (bd_shift - 1))) >> bd_shift
