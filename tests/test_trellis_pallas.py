"""Direct unit tests for the in-VMEM Pallas Viterbi (VERDICT r4 #4a).

kernels/trellis_pallas.trellis_rate claims bit-exactness (stored levels
AND committed-level rate) vs the sequential lax.scan trellis
(kernels/quantize.trellis_depquant — itself equality-tested against
spec/quant.py and the native C++ trellis) and the min-plus associative
scan (trellis_pscan_impl). This file enforces that claim in CI on the
interpret-mode Pallas path (the compiled Mosaic path is TPU-only; it was
additionally verified bit-exact on the real chip in round 4): sizes
4..32, adversarial blocks (all-zero, DC-only, tie-heavy, saturated) and
QP extremes. Behavioural reference: /root/reference/src/quantizer.rs
search_dq (:338-518) via spec/quant.py.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from wrenc_tpu.core.config import RateModelConfig
from wrenc_tpu.kernels import quantize as kq
from wrenc_tpu.kernels import trellis_pallas
from wrenc_tpu.spec import quant, transform


def _adversarial_blocks(log2, seed):
    """Residual-domain and direct-coefficient adversarial cases."""
    rng = np.random.default_rng(seed)
    s = 1 << log2
    t = rng.integers(-3000, 3000, (24, s, s)).astype(np.int32)
    t[0] = 0                                    # all-zero block
    t[1] = 0
    t[1, 0, 0] = 1                              # DC-only
    t[2] = rng.integers(-3, 4, (s, s))          # tie-heavy small coeffs
    # saturated: forward transform of a full-swing residual (the real
    # encoder-domain extreme)
    res = np.where(rng.integers(0, 2, (s, s)) > 0, 255, -255)
    t[3] = np.asarray(transform.forward(res.astype(np.int32)))
    t[4] = rng.integers(-1, 2, (s, s))          # +-1 field
    return t


@pytest.mark.parametrize("log2", [2, 3, 4, 5])
@pytest.mark.parametrize("qp", [8, 32, 51])
def test_trellis_pallas_bit_exact(log2, qp):
    rm = RateModelConfig()
    t = _adversarial_blocks(log2, seed=13 * log2 + qp)
    qpar = quant.derive_quant_params(qp, log2, log2, dep_quant=True,
                                     transform_skip=False)
    lam = jnp.asarray(kq.lam_dq_table(rm, qp, trellis=True))
    lv = jnp.asarray(kq.lv_table_device(rm, True, True))
    tj = jnp.asarray(t)
    q_seq = np.asarray(kq.trellis_depquant(
        tj, qpar.ls, qpar.bd_shift, lam, log2))
    r_seq = np.asarray(kq.dq_rate_scan(jnp.asarray(q_seq), log2, lv))
    q_pal, r_pal = trellis_pallas.trellis_rate(
        tj, np.int32(qpar.ls), np.int32(qpar.bd_shift), lam, lv, log2)
    q_pal, r_pal = np.asarray(q_pal), np.asarray(r_pal)
    assert (q_pal == q_seq).all(), (log2, qp, "stored levels differ")
    # rate is accumulated in the SAME f32 ascending-coding-order sequence
    # inside the kernel as dq_rate_scan -> exact equality, not allclose
    assert (r_pal == r_seq).all(), (log2, qp, "committed-level rate")


@pytest.mark.parametrize("log2", [2, 4])
def test_trellis_pallas_matches_pscan(log2):
    """Pallas kernel vs the round-3 min-plus associative scan (both must
    implement the identical tie-break discipline)."""
    rm = RateModelConfig()
    t = _adversarial_blocks(log2, seed=7 + log2)
    for qp in (22, 37):
        qpar = quant.derive_quant_params(qp, log2, log2, dep_quant=True,
                                         transform_skip=False)
        lam = jnp.asarray(kq.lam_dq_table(rm, qp, trellis=True))
        lv = jnp.asarray(kq.lv_table_device(rm, True, True))
        tj = jnp.asarray(t)
        q_ps = np.asarray(kq.trellis_depquant_pscan(
            tj, qpar.ls, qpar.bd_shift, lam, log2))
        q_pal, _ = trellis_pallas.trellis_rate(
            tj, np.int32(qpar.ls), np.int32(qpar.bd_shift), lam, lv, log2)
        assert (np.asarray(q_pal) == q_ps).all(), (log2, qp)


def test_trellis_rate_batch_matches_single():
    """The batched multi-size entry (one shared precompute + one kernel
    call per size class) must agree with per-size trellis_rate."""
    rm = RateModelConfig()
    qp = 32
    lam = jnp.asarray(kq.lam_dq_table(rm, qp, trellis=True))
    lv = jnp.asarray(kq.lv_table_device(rm, True, True))
    jobs = []
    singles = []
    for log2 in (2, 3, 4):
        t = _adversarial_blocks(log2, seed=100 + log2)
        qpar = quant.derive_quant_params(qp, log2, log2, dep_quant=True,
                                         transform_skip=False)
        jobs.append((jnp.asarray(t), np.int32(qpar.ls),
                     np.int32(qpar.bd_shift), log2))
        singles.append(trellis_pallas.trellis_rate(
            jnp.asarray(t), np.int32(qpar.ls), np.int32(qpar.bd_shift),
            lam, lv, log2))
    outs = trellis_pallas.trellis_rate_batch(jobs, lam, lv)
    for (q_b, r_b), (q_s, r_s) in zip(outs, singles):
        assert (np.asarray(q_b) == np.asarray(q_s)).all()
        assert (np.asarray(r_b) == np.asarray(r_s)).all()
