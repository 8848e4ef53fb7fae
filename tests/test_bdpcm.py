"""BDPCM residual DPCM (VERDICT r4 #9 — the last capability crumb).

The reference carries BDPCM's residual DPCM as dead code
(quantizer.rs:736-758 forward, :864-889 inverse; sps_bdpcm_enabled_flag
is never signalled). spec/quant.py implements the spec-correct pair
(the reference's forward pass differences in place against the
already-differenced neighbour and does not invert its own decoder —
documented dead-code bug); kernels/quantize.py is the batched device
analog. Both must round-trip bit-exactly and agree with each other.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from wrenc_tpu.kernels import quantize as kq
from wrenc_tpu.spec import quant


@pytest.mark.parametrize("n", [4, 8, 32])
@pytest.mark.parametrize("dir_flag", [0, 1])
def test_bdpcm_roundtrip_spec(n, dir_flag):
    rng = np.random.default_rng(n + dir_flag)
    q = rng.integers(-(1 << 14), 1 << 14, (n, n)).astype(np.int32)
    q[0] = 0                                  # flat seed row
    d = quant.bdpcm_dpcm(q, dir_flag)
    assert (quant.bdpcm_inverse(d, dir_flag) == q).all()
    # forward diffs against the ORIGINAL neighbour, not the running diff
    if dir_flag:
        assert (d[1:] == q[1:] - q[:-1]).all()
    else:
        assert (d[:, 1:] == q[:, 1:] - q[:, :-1]).all()


@pytest.mark.parametrize("dir_flag", [0, 1])
def test_bdpcm_kernel_matches_spec(dir_flag):
    rng = np.random.default_rng(5 + dir_flag)
    q = rng.integers(-(1 << 14), 1 << 14, (6, 8, 8)).astype(np.int32)
    d_k = np.asarray(kq.bdpcm_dpcm(jnp.asarray(q), dir_flag))
    r_k = np.asarray(kq.bdpcm_inverse(jnp.asarray(d_k), dir_flag))
    for b in range(q.shape[0]):
        assert (d_k[b] == quant.bdpcm_dpcm(q[b], dir_flag)).all()
        assert (r_k[b] == q[b]).all()


def test_bdpcm_inverse_clamps_per_step():
    """Adversarial bitstream: the running sum must clamp to int16 at
    every step (quantizer.rs:868-889), not only at the end."""
    d = np.zeros((1, 4), np.int32)
    d[0] = [30000, 10000, 10000, -70000]
    r = quant.bdpcm_inverse(d, 0)
    # 30000 -> clamp(40000)=32767 -> clamp(42767)=32767 -> -32768 seed
    # clamp first: -70000 -> -32768; 32767 + (-32768) = -1? The input
    # seed clamp applies to the CODED value, then the running sum:
    assert r[0, 0] == 30000
    assert r[0, 1] == 32767
    assert r[0, 2] == 32767
    assert r[0, 3] == 32767 + (-32768)
    dk = np.asarray(kq.bdpcm_inverse(jnp.asarray(d[None]), 0))[0]
    assert (dk == r).all()
