"""MTS (DST-VII/DCT-VIII) and LFNST: golden tests, device vs scalar spec.

Capability parity with transformer.rs:1236-1713 (MTS matrices) and
:11-933/:2319-2470 (LFNST); both tools stay disabled in the default
configuration exactly like the reference (its search never selects them).
"""
import numpy as np
import pytest

from wrenc_tpu.spec import transform as st
from wrenc_tpu.kernels import transforms as kt


@pytest.mark.parametrize("n", [4, 8, 16, 32])
@pytest.mark.parametrize("tr", [(1, 1), (2, 1), (1, 2), (2, 2), (0, 1)])
def test_mts_forward_inverse_golden(n, tr):
    rng = np.random.default_rng(n * 10 + tr[0] * 2 + tr[1])
    res = rng.integers(-255, 256, (5, n, n)).astype(np.int32)
    fwd_dev = np.asarray(kt.forward_mts(res, tr[0], tr[1]))
    for i in range(len(res)):
        ref = st.forward(res[i], tr[0], tr[1])
        assert (fwd_dev[i] == ref).all(), (n, tr, i)
    # inverse on realistic (quantization-like truncated) coefficients
    coeffs = (fwd_dev // 16).astype(np.int32)
    inv_dev = np.asarray(kt.inverse_mts(coeffs, tr[0], tr[1]))
    for i in range(len(coeffs)):
        ref = st.inverse(coeffs[i], tr[0], tr[1])
        assert (inv_dev[i] == ref).all(), (n, tr, i)


def test_mts_roundtrip_reasonable():
    """DST7/DCT8 forward->inverse approximately reproduces the residual
    (sanity that matrices/shifts are consistent end to end)."""
    rng = np.random.default_rng(0)
    res = rng.integers(-64, 65, (3, 8, 8)).astype(np.int32)
    c = st.forward(res[0], 1, 2)
    r = st.inverse(c, 1, 2)
    err = np.abs(r - res[0]).max()
    assert err <= 2, err


@pytest.mark.parametrize("size", [(4, 4), (8, 8), (16, 16), (4, 8), (8, 16)])
@pytest.mark.parametrize("mode", [0, 1, 10, 18, 34, 40, 50, 66])
@pytest.mark.parametrize("lfnst_idx", [1, 2])
def test_lfnst_device_matches_spec(size, mode, lfnst_idx):
    th, tw = size
    rng = np.random.default_rng(th * 100 + tw + mode)
    blocks = rng.integers(-512, 512, (4, th, tw)).astype(np.int32)
    fwd_dev = np.asarray(kt.forward_lfnst(blocks, mode, lfnst_idx))
    for i in range(len(blocks)):
        ref = st.forward_lfnst(blocks[i], mode, lfnst_idx)
        assert (fwd_dev[i] == ref).all(), (size, mode, lfnst_idx, i)
    # inverse applies to legal (zero-out satisfied) coefficients: use the
    # forward output, scaled down like dequantization would
    coeffs = (fwd_dev // 4).astype(np.int32)
    inv_dev = np.asarray(kt.inverse_lfnst(coeffs, mode, lfnst_idx))
    for i in range(len(coeffs)):
        ref = st.inverse_lfnst(coeffs[i], mode, lfnst_idx)
        assert (inv_dev[i] == ref).all(), (size, mode, lfnst_idx, i)


def test_lfnst_set_index_table():
    """Set selection (transformer.rs:1929-1946)."""
    assert st.lfnst_set_index(-5) == 1
    assert st.lfnst_set_index(0) == 0
    assert st.lfnst_set_index(1) == 0
    assert st.lfnst_set_index(2) == 1
    assert st.lfnst_set_index(12) == 1
    assert st.lfnst_set_index(13) == 2
    assert st.lfnst_set_index(23) == 2
    assert st.lfnst_set_index(24) == 3
    assert st.lfnst_set_index(44) == 3
    assert st.lfnst_set_index(45) == 2
    assert st.lfnst_set_index(55) == 2
    assert st.lfnst_set_index(56) == 1
    assert st.lfnst_set_index(66) == 1
