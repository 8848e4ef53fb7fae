"""On-device luma winner selection vs the host numpy path.

Round-5: _select_modes_dev moves the MPM-Jacobi mode selection and
candidate ranking into the fused stage-A jit (wavefront.py). The MPM
list derivation must agree with entropy.syntax.derive_mpm_list for
EVERY (left, above) pair, and end-to-end picks must agree with the host
_select_modes wherever costs are not f32-level near-ties (the host
combines f32 base + f64 scalar terms; the device combines in f32).
"""
import numpy as np

import jax.numpy as jnp

from wrenc_tpu.core.config import EncoderConfig
from wrenc_tpu.entropy.syntax import derive_mpm_list
from wrenc_tpu.search import WavefrontSearch
from wrenc_tpu.search import wavefront as wf

from tests.test_entropy_roundtrip import synth_frame


def test_mpm_list_dev_exhaustive():
    ll, aa = np.meshgrid(np.arange(67), np.arange(67), indexing='ij')
    got = np.asarray(wf._mpm_list_dev(jnp.asarray(ll.ravel(), jnp.int32),
                                      jnp.asarray(aa.ravel(), jnp.int32)))
    for i, (l, a) in enumerate(zip(ll.ravel(), aa.ravel())):
        want = derive_mpm_list(int(l), int(a))
        assert got[i].tolist() == want, (l, a, got[i], want)


def test_device_select_matches_host():
    cfg = EncoderConfig(width=96, height=96, qp=32)
    frames = [synth_frame(96, 96, seed=s) for s in (3, 4)]
    ws = WavefrontSearch(cfg)
    assert ws._select_device
    batch, sizes, res, _ = ws._dispatch_stage_a(frames)
    F = len(batch)

    ws_h = WavefrontSearch(cfg)
    ws_h._select_device = False
    _, _, res_h, _ = ws_h._dispatch_stage_a(frames)

    flips = total = 0
    for s in sizes:
        rk, cost, c2 = res[s]
        cands, base = res_h[s]
        mode_h, cost_h, ranked_h, cc_h = ws_h._select_modes(
            s, np.asarray(cands)[:F], np.asarray(base)[:F])
        mode_d = np.asarray(rk)[:F, :, 0].astype(np.int64)
        diff = mode_d != mode_h
        flips += int(diff.sum())
        total += int(mode_h.size)
        # every disagreement must be an f32-level near-tie in the host
        # cost model, not a systematic divergence
        if diff.any():
            ch = np.asarray(cost_h)[diff]
            cd = np.asarray(cost)[:F][diff]
            np.testing.assert_allclose(cd, ch, rtol=3e-6, atol=1e-2)
        # winner costs agree to f32 accuracy everywhere
        np.testing.assert_allclose(np.asarray(cost)[:F], cost_h,
                                   rtol=3e-6, atol=1e-2)
        # ranked candidate SETS agree where no flip occurred (order of
        # exact ties may differ: np quicksort vs jnp stable sort)
        same = ~diff
        assert (np.sort(np.asarray(rk)[:F][same], -1)
                == np.sort(ranked_h[same], -1)).all()
    rate = flips / max(total, 1)
    print(f"device-select flips: {flips}/{total} ({100 * rate:.3f}%)")
    assert rate < 0.01, (flips, total)


def test_device_select_roundtrip():
    """Conformance is selection-independent: encode with device select,
    decode, byte-compare reconstruction."""
    from wrenc_tpu.encoder import Encoder
    from wrenc_tpu.decoder import decode_annexb
    cfg = EncoderConfig(width=64, height=64, qp=30)
    frames = [synth_frame(64, 64, seed=7)]
    enc = Encoder(cfg, search=WavefrontSearch(cfg))
    stream, recons = enc.encode(frames)
    dec = decode_annexb(stream)
    for c in range(3):
        assert (dec[0][c] == recons[0][c]).all()
