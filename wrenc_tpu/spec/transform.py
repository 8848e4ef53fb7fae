"""Forward / inverse transforms (spec 8.7.4).

Separable integer transforms over int32/int64 with the spec's shift/round/
clamp discipline. Behavioural reference: transformer.rs:2040 (forward) and
:2380 (inverse). Matrices come from core.tables (spec data).

Conventions: blocks are (th, tw) arrays indexed [y][x]; tr_type 0=DCT-II,
1=DST-VII, 2=DCT-VIII; transform-skip is handled by the caller (passthrough).
"""
import numpy as np

from ..core import tables

COEFF_MIN = -(1 << 15)
COEFF_MAX = (1 << 15) - 1


def non_zero_size(tw, th, tr_type_hor, tr_type_ver):
    """Zero-out region (spec: MTS keeps 16, DCT-II keeps 32 coefficients)."""
    nzw = min(tw, 16 if tr_type_hor > 0 else 32)
    nzh = min(th, 16 if tr_type_ver > 0 else 32)
    return nzw, nzh


def forward(res, tr_type_hor=0, tr_type_ver=0, bit_depth=8):
    """Forward transform of residual block `res` ((th, tw) int) -> int32 coeffs.

    Matches transformer.rs:2040: horizontal pass, shift log2(tw)-1+(bd-8);
    vertical pass, shift log2(th)+6; zero-out applied.
    """
    res = np.asarray(res, dtype=np.int64)
    th, tw = res.shape
    log2_tw = tw.bit_length() - 1
    log2_th = th.bit_length() - 1
    nzw, nzh = non_zero_size(tw, th, tr_type_hor, tr_type_ver)

    t_h = tables.trans_matrix(tr_type_hor, tw).astype(np.int64)  # (rows, tw)
    t_v = tables.trans_matrix(tr_type_ver, th).astype(np.int64)  # (rows, th)

    # horizontal: H[y][i] = sum_x T_h[i][x] * res[y][x]
    h = res @ t_h[:nzw].T  # (th, nzw)
    shift1 = log2_tw - 1 + (bit_depth - 8)
    h = (h + (1 << (shift1 - 1))) >> shift1

    # vertical: C[i][x] = sum_y T_v[i][y] * H[y][x]
    c = t_v[:nzh] @ h  # (nzh, nzw)
    shift2 = log2_th + 6
    c = (c + (1 << (shift2 - 1))) >> shift2

    out = np.zeros((th, tw), dtype=np.int32)
    out[:nzh, :nzw] = c
    return out


def inverse(coeffs, tr_type_hor=0, tr_type_ver=0, bit_depth=8):
    """Inverse transform of dequantized coefficients -> int16 residual.

    Matches transformer.rs:2380: vertical pass first, intermediate
    (v+64)>>7 clamp to int16 range, horizontal pass, final shift
    20-bit_depth.
    """
    coeffs = np.asarray(coeffs, dtype=np.int64)
    th, tw = coeffs.shape
    nzw, nzh = non_zero_size(tw, th, tr_type_hor, tr_type_ver)

    t_h = tables.trans_matrix(tr_type_hor, tw).astype(np.int64)
    t_v = tables.trans_matrix(tr_type_ver, th).astype(np.int64)

    # vertical: V[y][x] = sum_i T_v[i][y] * C[i][x], i < nzh
    v = t_v[:nzh].T @ coeffs[:nzh]  # (th, tw)
    v = np.clip((v + 64) >> 7, COEFF_MIN, COEFF_MAX)

    # horizontal: R[y][x] = sum_i T_h[i][x] * V[y][i], i < nzw
    r = v[:, :nzw] @ t_h[:nzw]  # (th, tw)

    bd_shift = 20 - bit_depth
    r = (r + (1 << (bd_shift - 1))) >> bd_shift
    return r.astype(np.int16)
