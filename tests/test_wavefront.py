"""TPU wavefront search: conformant round trip + quality sanity vs scalar."""
import numpy as np
import pytest

from wrenc_tpu.core.config import EncoderConfig
from wrenc_tpu.decoder import decode_annexb
from wrenc_tpu.encoder import Encoder
from wrenc_tpu.search import WavefrontSearch

from tests.test_entropy_roundtrip import synth_frame


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255 ** 2 / mse)


@pytest.mark.parametrize("qp", [27, 37])
def test_wavefront_roundtrip(qp):
    cfg = EncoderConfig(width=64, height=64, qp=qp)
    frame = synth_frame(64, 64, seed=qp)
    enc = Encoder(cfg, search=WavefrontSearch(cfg))
    stream, recons = enc.encode([frame])
    frames = decode_annexb(stream)
    for c in range(3):
        assert (frames[0][c] == recons[0][c]).all(), c


def test_wavefront_quality_reasonable():
    """Wavefront result should be within ~1 dB / 30% bytes of the scalar
    golden encoder on a textured frame."""
    cfg = EncoderConfig(width=64, height=64, qp=32)
    frame = synth_frame(64, 64, seed=77)
    sw, sr = Encoder(cfg, search=WavefrontSearch(cfg)).encode([frame])
    gw, gr = Encoder(cfg).encode([frame])
    p_w = psnr(sr[0][0], frame[0])
    p_g = psnr(gr[0][0], frame[0])
    assert p_w > p_g - 1.5, (p_w, p_g)
    assert len(sw) < len(gw) * 1.4 + 200, (len(sw), len(gw))
