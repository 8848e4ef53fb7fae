"""Transform round-trip + quantization behaviour of the scalar spec model."""
import numpy as np
import pytest

from wrenc_tpu.core.config import RateModelConfig
from wrenc_tpu.spec import transform, quant


@pytest.mark.parametrize("n", [4, 8, 16, 32])
def test_dct2_roundtrip_small_error(n):
    rng = np.random.default_rng(0)
    res = rng.integers(-255, 256, size=(n, n)).astype(np.int32)
    c = transform.forward(res)
    r = transform.inverse(c)
    err = np.abs(r.astype(np.int64) - res)
    assert err.max() <= 4, err.max()


@pytest.mark.parametrize("n", [4, 8, 16])
def test_mts_roundtrip(n):
    rng = np.random.default_rng(1)
    res = rng.integers(-255, 256, size=(n, n)).astype(np.int32)
    for th, tv in [(1, 1), (2, 1), (1, 2), (2, 2)]:
        c = transform.forward(res, th, tv)
        r = transform.inverse(c, th, tv)
        err = np.abs(r.astype(np.int64) - res)
        assert err.max() <= 5, (th, tv, err.max())


def test_zero_out_region():
    res = np.ones((32, 32), dtype=np.int32) * 100
    c = transform.forward(res, 1, 1)  # DST7: keep 16x16
    assert (c[16:, :] == 0).all() and (c[:, 16:] == 0).all()


def test_full_scan_covers_block():
    s = quant.full_scan(3, 3)
    assert s.shape == (64, 2)
    assert len({(x, y) for x, y in s.tolist()}) == 64
    # first 16 entries are the DC sub-block
    assert all(x < 4 and y < 4 for x, y in s[:16].tolist())


@pytest.mark.parametrize("qp", [22, 27, 32, 37])
def test_scalar_quant_roundtrip(qp):
    rng = np.random.default_rng(2)
    res = rng.integers(-200, 201, size=(8, 8)).astype(np.int32)
    t = transform.forward(res)
    qpar = quant.derive_quant_params(qp, 3, 3, dep_quant=False,
                                     transform_skip=False)
    q = quant.quantize_rdoq_off(t, qpar)
    d = quant.dequantize(q, qpar)
    # dequantized value approximates the transform coefficient
    step = qpar.ls / (1 << qpar.bd_shift)
    assert np.abs(d.astype(np.int64) - t).max() <= step * 0.75 + 1


@pytest.mark.parametrize("trellis", [False, True])
def test_dep_quant_levels_consistent(trellis):
    """Stored q levels must be consistent with the coded AbsLevels + state."""
    rng = np.random.default_rng(3)
    res = rng.integers(-200, 201, size=(8, 8)).astype(np.int32)
    t = transform.forward(res)
    qp = 30
    qpar = quant.derive_quant_params(qp, 3, 3, dep_quant=True,
                                     transform_skip=False)
    dq = quant.DepQuantizer(RateModelConfig())
    q = dq.quantize(t, qp, qpar, trellis=trellis)
    a, states = quant.abs_levels_from_q(q, 3, 3)
    # reconstruct q from (a, state): q = sign * (2a - (state>1)) when a>0
    delta = (states > 1).astype(np.int32)
    mag = np.where(a > 0, 2 * a - delta, 0)
    assert (np.abs(q) == mag).all()
    # dequantized output close to the transform coefficients
    d = quant.dequantize(q, qpar)
    step = qpar.ls / (1 << qpar.bd_shift)
    assert np.abs(d.astype(np.int64) - t).max() <= step * 1.5 + 1


def test_trellis_cheaper_or_equal_cost():
    """Trellis should never produce larger |q| reconstruction error than
    greedy by much; sanity check it runs and zeros trailing regions."""
    rng = np.random.default_rng(4)
    res = (rng.integers(-8, 9, size=(4, 4))).astype(np.int32)
    t = transform.forward(res)
    qpar = quant.derive_quant_params(37, 2, 2, dep_quant=True,
                                     transform_skip=False)
    dq = quant.DepQuantizer(RateModelConfig())
    q_g = dq.quantize(t, 37, qpar, trellis=False)
    q_t = dq.quantize(t, 37, qpar, trellis=True)
    assert q_g.shape == q_t.shape == (4, 4)
