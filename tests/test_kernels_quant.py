"""Golden tests: batched transforms + dep-quant kernels vs the spec model."""
import numpy as np
import pytest

from wrenc_tpu.core.config import RateModelConfig
from wrenc_tpu.kernels import quantize as kq
from wrenc_tpu.kernels import transforms as kt
from wrenc_tpu.spec import quant, transform


@pytest.mark.parametrize("n", [4, 8, 16, 32])
def test_forward_inverse_dct2_exact(n):
    rng = np.random.default_rng(n)
    res = rng.integers(-255, 256, size=(5, n, n)).astype(np.int32)
    fwd = np.asarray(kt.forward_dct2(res))
    inv = np.asarray(kt.inverse_dct2(fwd))
    for i in range(5):
        ref_f = transform.forward(res[i])
        assert (fwd[i] == ref_f).all(), n
        ref_i = transform.inverse(ref_f)
        assert (inv[i] == ref_i).all(), n


@pytest.mark.parametrize("n,qp", [(4, 32), (8, 27), (16, 37), (32, 32)])
def test_greedy_depquant_matches_spec(n, qp):
    rng = np.random.default_rng(n + qp)
    rm = RateModelConfig()
    log2 = n.bit_length() - 1
    res = rng.integers(-180, 181, size=(6, n, n)).astype(np.int32)
    t = np.stack([transform.forward(r) for r in res])
    qpar = quant.derive_quant_params(qp, log2, log2, dep_quant=True,
                                     transform_skip=False)
    lam_dq = kq.lam_dq_table(rm, qp, trellis=False)
    lv = kq.lv_table_device(rm, True, False)
    q_kernel, rate = kq.greedy_depquant(t, qpar.ls, qpar.bd_shift, lam_dq,
                                        log2, lv)
    q_kernel = np.asarray(q_kernel)
    dq = quant.DepQuantizer(rm)
    for i in range(6):
        ref = dq.quantize(t[i], qp, qpar, trellis=False)
        assert (q_kernel[i] == ref).all(), (n, qp, i)


@pytest.mark.parametrize("n,qp", [(4, 32), (8, 37), (16, 27)])
def test_trellis_depquant_matches_spec_cost(n, qp):
    """Trellis kernel must achieve the same optimal objective as the numpy
    Viterbi (tie-breaks may differ; cost must not)."""
    rng = np.random.default_rng(n * 3 + qp)
    rm = RateModelConfig()
    log2 = n.bit_length() - 1
    res = rng.integers(-120, 121, size=(4, n, n)).astype(np.int32)
    t = np.stack([transform.forward(r) for r in res])
    qpar = quant.derive_quant_params(qp, log2, log2, dep_quant=True,
                                     transform_skip=False)
    lam_dq = kq.lam_dq_table(rm, qp, trellis=True)
    q_kernel = np.asarray(kq.trellis_depquant(t, qpar.ls, qpar.bd_shift,
                                              lam_dq, log2))
    dq = quant.DepQuantizer(rm)

    def objective(q, tt):
        lam = dq._lambda(qp, True)
        a, states = quant.abs_levels_from_q(q, log2, log2)
        scan = quant.full_scan(log2, log2)[::-1]
        total = 0
        trailing = True
        for sx, sy in scan:
            av, qv = int(a[sy, sx]), int(q[sy, sx])
            dqv = (qv * qpar.ls + qpar.bd_offset) >> qpar.bd_shift
            dist = abs(int(tt[sy, sx]) - dqv)
            bits = 0 if (av == 0 and trailing) else av + 1
            total += 128 * dist + lam * dq._rate(bits)
            trailing = trailing and av == 0
        if trailing:
            total -= lam * dq._rate(1)
        return total

    for i in range(4):
        ref = dq.quantize(t[i], qp, qpar, trellis=True)
        ok = objective(q_kernel[i], t[i])
        ro = objective(ref, t[i])
        assert ok == ro, (n, qp, i, ok, ro)
        # stored levels must be parity-consistent for the entropy coder
        a, states = quant.abs_levels_from_q(q_kernel[i], log2, log2)
        delta = (states > 1).astype(np.int32)
        mag = np.where(a > 0, 2 * a - delta, 0)
        assert (np.abs(q_kernel[i]) == mag).all()


def test_dequantize_kernel():
    rng = np.random.default_rng(0)
    q = rng.integers(-100, 101, size=(3, 8, 8)).astype(np.int16)
    qpar = quant.derive_quant_params(30, 3, 3, dep_quant=True,
                                     transform_skip=False)
    d = np.asarray(kq.dequantize(q, qpar.ls, qpar.bd_shift))
    for i in range(3):
        assert (d[i] == quant.dequantize(q[i], qpar)).all()


@pytest.mark.parametrize("log2", [2, 3, 4, 5])
def test_dq_rate_device_matches_scan(log2):
    """The log-depth pairwise-composition level-rate (dq_rate_device, used
    inside the device-commit scan) must equal the sequential lax.scan walk
    on random AND adversarial blocks: all-zero, many-zero/DC-only (the
    trailing-zero rate exemption path), and saturated high levels (the
    1023 table clip)."""
    rm = RateModelConfig()
    rng = np.random.default_rng(31 + log2)
    s = 1 << log2
    q = rng.integers(-40, 41, (16, s, s))
    q[0] = 0                                   # all-zero
    q[1] = 0
    q[1, 0, 0] = 3                             # DC-only
    q[2] = np.where(rng.random((s, s)) < 0.9, 0, q[2])   # sparse
    q[3] = rng.integers(1800, 2400, (s, s))    # clips at lv[1023]
    q = q.astype(np.int16)
    from wrenc_tpu.core import tables

    def exact_rate(qb, lv):
        """Reference int64 walk (level_rate, wrenc_native.cpp)."""
        order = np.asarray(kq.coding_order(log2))
        v = np.abs(qb.reshape(-1)[order].astype(np.int64))
        qs, trailing, tot = 0, True, 0
        for x in v:
            a = (x + (1 if qs > 1 else 0)) // 2
            if a == 0:
                if not trailing:
                    tot += int(lv[0])
            else:
                tot += int(lv[min(a, 1023)])
                trailing = False
            qs = tables.Q_STATE_TRANS[qs, a & 1]
        return tot

    for trellis in (False, True):
        lv = kq.lv_table_device(rm, True, trellis)
        r_scan = np.asarray(kq.dq_rate_scan(q, log2, lv))
        r_dev = np.asarray(kq.dq_rate_device(q, log2, lv))
        ref = np.array([exact_rate(qb, lv) for qb in q], np.float64)
        # same state walk -> same per-position rates; only f32 summation
        # ORDER differs. Pairwise summation (dq_rate_device) carries ~100x
        # less rounding than the sequential scan on saturated 32x32 blocks
        # (measured: 5e-8 vs 6e-6 relative) — bound each accordingly, and
        # require exact agreement wherever the total is f32-exact.
        assert np.allclose(r_scan, ref, rtol=2e-5), (log2, trellis)
        assert np.allclose(r_dev, ref, rtol=1e-6), (log2, trellis)
        small = ref < 2 ** 24
        assert np.array_equal(r_scan[small], r_dev[small]), (log2, trellis)
        assert np.array_equal(r_scan[small], ref[small]), (log2, trellis)


@pytest.mark.parametrize("log2", [2, 3, 4, 5])
def test_trellis_parallel_scan_matches_sequential(log2):
    """The min-plus associative-scan Viterbi (log-depth, TPU-native) must
    be bit-identical to the sequential lax.scan trellis (itself
    equality-tested against spec.quant and the native trellis), including
    tie-breaking, all-zero blocks and DC-only blocks."""
    import jax.numpy as jnp
    from wrenc_tpu.core.config import RateModelConfig
    from wrenc_tpu.kernels import quantize as kq
    from wrenc_tpu.spec import quant

    rm = RateModelConfig()
    rng = np.random.default_rng(7 + log2)
    s = 1 << log2
    t = rng.integers(-3000, 3000, (24, s, s)).astype(np.int32)
    t[0] = 0                                   # all-zero block
    t[1] = 0
    t[1, 0, 0] = 1                             # DC-only
    t[2] = rng.integers(-3, 4, (s, s))         # tie-heavy small coeffs
    for qp in (22, 37):
        qpar = quant.derive_quant_params(qp, log2, log2, dep_quant=True,
                                         transform_skip=False)
        lam = jnp.asarray(kq.lam_dq_table(rm, qp, trellis=True))
        q_seq = np.asarray(kq.trellis_depquant(
            jnp.asarray(t), qpar.ls, qpar.bd_shift, lam, log2))
        q_par = np.asarray(kq.trellis_depquant_pscan(
            jnp.asarray(t), qpar.ls, qpar.bd_shift, lam, log2))
        assert (q_seq == q_par).all(), (log2, qp)
