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


# TPU matmuls default to single-pass bf16 (inexact for our integers);
# HIGHEST selects the 6-pass scheme, exact for integer operands < 2^16
# (every operand here is), and is plain f32 on CPU.
EXACT = jax.lax.Precision.HIGHEST


def _f32mm(a, spec, t):
    """Exact int matmul on the MXU: operands small enough for f32."""
    return jnp.einsum(spec, a.astype(jnp.float32), t.astype(jnp.float32),
                      preferred_element_type=jnp.float32,
                      precision=EXACT).astype(jnp.int32)


def _f32mm_split(a, spec, t, bits=9):
    """Exact int matmul with a hi/lo split (sums may exceed 2^24)."""
    lo = a & ((1 << bits) - 1)
    hi = a >> bits          # arithmetic shift keeps hi*2^bits + lo == a
    chi = _f32mm(hi, spec, t)
    clo = _f32mm(lo, spec, t)
    return (chi << bits) + clo


@jax.jit
def _forward(res):
    return forward_impl(res)


def forward_impl(res):
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
    return inverse_impl(coeffs)


def inverse_impl(coeffs):
    n = coeffs.shape[-1]
    t = jnp.asarray(_dct2(n))
    # vertical: V[y,x] = sum_i T[i,y] C[i,x]
    v = _f32mm_split(coeffs.astype(jnp.int32), 'nix,iy->nyx', t)
    v = jnp.clip((v + 64) >> 7, COEFF_MIN, COEFF_MAX)
    # horizontal: R[y,x] = sum_i T[i,x] V[y,i]
    r = _f32mm_split(v, 'nyi,ix->nyx', t)
    bd_shift = 12  # 20 - bit_depth(8)
    return (r + (1 << (bd_shift - 1))) >> bd_shift


# ---------------------------------------------------------------------------
# MTS (DST-VII / DCT-VIII) and LFNST device kernels. Disabled in the
# default tool set (parity with the reference, whose search never selects
# them either: transformer.rs:1236-1713, :11-933); shipped for capability
# parity, bit-exact vs spec/transform.py (golden tests).
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _tmat_padded(tr_type, n):
    """Transform matrix padded to (n, n): the 32-pt MTS matrices store only
    16 rows (zero-out); zero rows produce the zeroed-out coefficients."""
    m = tables.trans_matrix(tr_type, n).astype(np.int32)
    if m.shape[0] < n:
        m = np.concatenate([m, np.zeros((n - m.shape[0], n), np.int32)])
    return m


@functools.partial(jax.jit, static_argnums=(1, 2))
def forward_mts(res, tr_type_hor, tr_type_ver):
    """Forward separable transform, any (tr_hor, tr_ver) pair; blocks
    (N, n, n) int -> (N, n, n) int32 with zero-out applied."""
    n = res.shape[-1]
    log2n = n.bit_length() - 1
    th_m = jnp.asarray(_tmat_padded(tr_type_hor, n))
    tv_m = jnp.asarray(_tmat_padded(tr_type_ver, n))
    h = _f32mm(res.astype(jnp.int32), 'nyx,ix->nyi', th_m)
    s1 = log2n - 1
    h = (h + (1 << (s1 - 1))) >> s1
    c = _f32mm_split(h, 'nyi,jy->nji', tv_m)
    s2 = log2n + 6
    return (c + (1 << (s2 - 1))) >> s2


@functools.partial(jax.jit, static_argnums=(1, 2))
def inverse_mts(coeffs, tr_type_hor, tr_type_ver):
    """Inverse separable transform, any (tr_hor, tr_ver) pair (8-bit)."""
    from ..spec.transform import non_zero_size
    n = coeffs.shape[-1]
    nzw, nzh = non_zero_size(n, n, tr_type_hor, tr_type_ver)
    # mask coefficients outside the zero-out region (the spec sums only
    # i < nz; a legal stream has zeros there anyway)
    mask = (jnp.arange(n)[:, None] < nzh) & (jnp.arange(n)[None, :] < nzw)
    c = jnp.where(mask[None], coeffs.astype(jnp.int32), 0)
    th_m = jnp.asarray(_tmat_padded(tr_type_hor, n))
    tv_m = jnp.asarray(_tmat_padded(tr_type_ver, n))
    v = _f32mm_split(c, 'nix,iy->nyx', tv_m)
    v = jnp.clip((v + 64) >> 7, COEFF_MIN, COEFF_MAX)
    r = _f32mm_split(v, 'nyi,ix->nyx', th_m)
    bd_shift = 12
    return (r + (1 << (bd_shift - 1))) >> bd_shift


@functools.lru_cache(maxsize=None)
def _lfnst_consts(n, n_tr_s, set_idx, lfnst_idx, transposed):
    from ..spec import transform as st
    ys, xs = st._lfnst_region_indices(n, n_tr_s, transposed)
    m = tables.lfnst_matrix(n_tr_s, set_idx, lfnst_idx).astype(np.int32)
    scan = tables.diag_scan(2, 2)
    return ys, xs, m, scan


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def forward_lfnst(coeffs, pred_mode_intra, lfnst_idx, _unused=0):
    """Batched forward LFNST on (N, th, tw) separable-transform outputs.

    All blocks share one (mode-derived set, lfnst_idx); group by those to
    batch. Bit-exact vs spec/transform.forward_lfnst."""
    from ..spec import transform as st
    N, th_, tw = coeffs.shape
    n, n_tr_s, nz = st._lfnst_geometry(tw, th_)
    ys, xs, m, scan = _lfnst_consts(n, n_tr_s,
                                    st.lfnst_set_index(pred_mode_intra),
                                    lfnst_idx, pred_mode_intra > 34)
    v = coeffs[:, jnp.asarray(ys), jnp.asarray(xs)]         # (N, nTrS)
    u = _f32mm_split(v.astype(jnp.int32), 'nj,ij->ni', jnp.asarray(m))
    u = (u + 64) >> 7                                       # (N, 16)
    out = jnp.zeros((N, th_, tw), jnp.int32)
    sy = jnp.asarray(scan[:nz, 1])
    sx = jnp.asarray(scan[:nz, 0])
    return out.at[:, sy, sx].set(u[:, :nz])


@functools.partial(jax.jit, static_argnums=(1, 2))
def inverse_lfnst(coeffs, pred_mode_intra, lfnst_idx):
    """Batched inverse LFNST on (N, th, tw) dequantized coefficients."""
    from ..spec import transform as st
    N, th_, tw = coeffs.shape
    n, n_tr_s, nz = st._lfnst_geometry(tw, th_)
    ys, xs, m, scan = _lfnst_consts(n, n_tr_s,
                                    st.lfnst_set_index(pred_mode_intra),
                                    lfnst_idx, pred_mode_intra > 34)
    sy = jnp.asarray(scan[:nz, 1])
    sx = jnp.asarray(scan[:nz, 0])
    u = coeffs[:, sy, sx].astype(jnp.int32)                 # (N, nz)
    v = _f32mm_split(u, 'ni,ij->nj', jnp.asarray(m[:nz]))   # (N, nTrS)
    v = jnp.clip((v + 64) >> 7, COEFF_MIN, COEFF_MAX)
    out = coeffs.astype(jnp.int32)
    return out.at[:, jnp.asarray(ys), jnp.asarray(xs)].set(v)
