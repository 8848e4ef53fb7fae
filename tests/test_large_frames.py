"""Large-frame geometry: 1080p-class dimensions through the full pipeline.

The full 1920x1088 TPU benchmark lives in wrenc_tpu.tools.bench1080p
(results/1080p.json); here we keep CI-sized checks that the geometry
machinery (gather tables, WPP rows, chunk pixel budget) handles
1080p-width frames and that big-frame chunking engages.
"""
import numpy as np

from wrenc_tpu.core.config import EncoderConfig


def test_wide_frame_roundtrip():
    """Full 1920-sample-wide CTU row strip: exercises 1080p-width gather
    tables, WPP entry points and the conformance round trip."""
    from wrenc_tpu.encoder import Encoder
    from wrenc_tpu.decoder import decode_annexb
    from wrenc_tpu.search import WavefrontSearch

    rng = np.random.default_rng(6)
    W, H = 1920, 64
    yy, xx = np.mgrid[0:H, 0:W]
    y = np.clip(np.sin(xx / 19) * 70 + np.cos(yy / 7) * 40 + 128
                + rng.integers(-6, 7, (H, W)), 0, 255).astype(np.uint8)
    frame = (y, (y[::2, ::2] // 2 + 50).astype(np.uint8),
             (210 - y[::2, ::2] // 2).astype(np.uint8))
    cfg = EncoderConfig(width=W, height=H, qp=34,
                        entropy_coding_sync_enabled=True,
                        entry_point_offsets_present=True)
    stream, recons = Encoder(cfg, search=WavefrontSearch(cfg)) \
        .encode([frame])
    dec = decode_annexb(stream)
    for c in range(3):
        assert (dec[0][c] == recons[0][c]).all(), c


def test_pixel_budget_chunks_big_frames():
    from wrenc_tpu.search import WavefrontSearch
    cfg = EncoderConfig(width=1920, height=1088, qp=32)
    s = WavefrontSearch(cfg)
    assert s._buckets() == [1]
    cfg2 = EncoderConfig(width=352, height=288, qp=32)
    s2 = WavefrontSearch(cfg2)
    assert s2._buckets()[-1] == 8
