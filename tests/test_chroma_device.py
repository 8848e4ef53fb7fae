"""Fused on-device chroma stage A vs the native C++ chroma stage A
(VERDICT r4 #4b).

The device pipeline's chroma stage A (`_prefill_chroma_device`, one
fused jit: derived + CCLM + SCIPU costs for every chroma size) replaces
the host call (`_prefill_chroma_cache` -> wrenc_chroma_stage_a). The
native path combines SSD + lambda*rate in f64; the device path combines
in f32, so near-ties in the CCLM mode argmin may flip. This test runs
BOTH paths on identical stage-A inputs and checks:

  * every cost surface (leaf / scipu / cclm-best) matches to f32
    accuracy;
  * CCLM mode picks agree except at counted near-ties, where the native
    cost gap between the two picked modes must itself be at f32 noise
    level — and the tie rate is logged and bounded.

Behavioural reference: the chroma half of
/root/reference/src/block_splitter.rs:476-780.
"""
import numpy as np
import pytest

from wrenc_tpu.core.config import EncoderConfig
from wrenc_tpu.search import WavefrontSearch

from tests.test_entropy_roundtrip import synth_frame


class _Captured(Exception):
    pass


def _capture_both(w, h, qp, seeds):
    from wrenc_tpu.entropy import native
    if not native.available():
        pytest.skip("native chroma stage A unavailable")
    cfg = EncoderConfig(width=w, height=h, qp=qp)
    frames = [synth_frame(w, h, seed=s) for s in seeds]
    ws = WavefrontSearch(cfg, commit_engine='device')
    assert ws._chroma_device, "device pipeline must default to fused chroma"
    got = {}
    orig = ws._prefill_chroma_device

    def spy(cache, luma_mode_b, sizes, F, dev_planes):
        orig(cache, luma_mode_b, sizes, F, dev_planes)
        ncache = {}
        ws._prefill_chroma_cache(ncache, luma_mode_b, sizes, F)
        got['dev'], got['nat'] = dict(cache), ncache
        raise _Captured  # stage A compared; skip the (slow) commit

    ws._prefill_chroma_device = spy
    with pytest.raises(_Captured):
        ws.encode_frames(frames)
    return got['dev'], got['nat']


@pytest.mark.parametrize("w,h,qp,seeds", [
    (96, 64, 32, (5, 6)), (64, 96, 22, (7,)),
])
def test_fused_chroma_matches_native(w, h, qp, seeds):
    dev, nat = _capture_both(w, h, qp, seeds)
    assert set(dev) == set(nat), (sorted(dev), sorted(nat))
    ties = total = 0
    for key in sorted(nat):
        if key[0] == 'cclm':
            cd, md = dev[key]
            cn, mn = nat[key]
            np.testing.assert_allclose(cd, cn, rtol=2e-5, atol=0.5,
                                       err_msg=str(key))
            diff = md != mn
            ties += int(diff.sum())
            total += int(mn.size)
            if diff.any():
                # a flipped pick must be a genuine f32 near-tie: the two
                # best costs agree to f32 accuracy on both paths already
                # (asserted above), so just bound the flipped fraction
                # below; nothing systematic may hide behind "ties"
                assert diff.mean() < 0.02, (key, int(diff.sum()))
        else:
            np.testing.assert_allclose(dev[key], nat[key], rtol=2e-5,
                                       atol=0.5, err_msg=str(key))
    rate = ties / max(total, 1)
    print(f"cclm tie flips: {ties}/{total} ({100.0 * rate:.3f}%)")
    assert rate < 0.02, (ties, total)
