"""WPP (entropy_coding_sync): per-CTU-row CABAC subsets with context
storage/sync and slice-header entry points (slice_encoder.rs:302-333,
380-411; bool_coder.rs:1096-1104)."""
import numpy as np
import pytest

from wrenc_tpu.core.config import EncoderConfig
from wrenc_tpu.decoder import decode_annexb
from wrenc_tpu.encoder import Encoder
from wrenc_tpu.entropy import native
from wrenc_tpu.search import WavefrontSearch


def _frames(W, H, n=2):
    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:H, 0:W]
    out = []
    for i in range(n):
        y = np.clip(np.sin(xx / 8 + i) * 70 + np.cos(yy / 11) * 50 + 128
                    + rng.integers(-8, 9, (H, W)), 0, 255).astype(np.uint8)
        cb = np.clip(y[::2, ::2] // 2 + 40, 0, 255).astype(np.uint8)
        cr = np.clip(200 - y[::2, ::2] // 2, 0, 255).astype(np.uint8)
        out.append((y, cb, cr))
    return out


def _wpp_cfg(W, H, qp=30):
    cfg = EncoderConfig(width=W, height=H, qp=qp)
    cfg.entropy_coding_sync_enabled = True
    cfg.entry_point_offsets_present = True
    return cfg


@pytest.mark.parametrize("use_native", [False, True])
def test_wpp_roundtrip(use_native):
    if use_native and not native.available():
        pytest.skip("no native library")
    W, H = 96, 96
    frames = _frames(W, H)
    cfg = _wpp_cfg(W, H)
    enc = Encoder(cfg, search=WavefrontSearch(cfg), use_native=use_native)
    stream, recons = enc.encode(frames)
    dec = decode_annexb(stream)
    assert len(dec) == len(recons)
    for fa, fb in zip(recons, dec):
        for a, b in zip(fa, fb):
            assert np.array_equal(a, b)


def test_wpp_native_matches_python():
    if not native.available():
        pytest.skip("no native library")
    W, H = 96, 96
    frames = _frames(W, H)
    cfg = _wpp_cfg(W, H)
    s_py, _ = Encoder(cfg, search=WavefrontSearch(cfg),
                      use_native=False).encode(frames)
    s_nat, _ = Encoder(cfg, search=WavefrontSearch(cfg),
                       use_native=True).encode(frames)
    assert s_py == s_nat


def test_wpp_recon_matches_non_wpp():
    """WPP only changes entropy packaging, not decisions/reconstruction."""
    W, H = 96, 96
    frames = _frames(W, H)
    cfg = _wpp_cfg(W, H)
    _, r_wpp = Encoder(cfg, search=WavefrontSearch(cfg)).encode(frames)
    cfg2 = EncoderConfig(width=W, height=H, qp=30)
    _, r_std = Encoder(cfg2, search=WavefrontSearch(cfg2)).encode(frames)
    for fa, fb in zip(r_wpp, r_std):
        for a, b in zip(fa, fb):
            assert np.array_equal(a, b)
