"""Independent (clean-room) conformance decoder vs the encoder.

These tests are the repo's answer to the reference's VTM integration test
(scripts/intergration_test.sh): the stream must decode in a parser that
shares NO code with the encoder's syntax layer, and the reconstruction
must byte-match the encoder's. A syntax misunderstanding in
entropy/syntax.py (e.g. round 1's missing mts_idx) desyncs this decoder
even though the shared-source round trip stays green.
"""
import numpy as np
import pytest

from wrenc_tpu.core.config import EncoderConfig
from wrenc_tpu.conformance import (ConformanceError,
                                   decode_annexb_independent)


def synth(w, h, seed):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(((xx * 3 + yy * 2) % 256)
                + rng.integers(-12, 13, (h, w)), 0, 255).astype(np.uint8)
    cb = (y[::2, ::2] // 2 + 60).astype(np.uint8)
    cr = (255 - y[::2, ::2] // 2).astype(np.uint8)
    return y, cb, cr


@pytest.mark.parametrize("w,h,qp,seed", [
    (64, 64, 22, 1), (64, 64, 32, 2), (64, 32, 37, 3), (96, 64, 27, 4),
])
def test_independent_decode_matches_reconstruction(w, h, qp, seed):
    from wrenc_tpu.encoder import Encoder
    cfg = EncoderConfig(width=w, height=h, qp=qp)
    stream, recons = Encoder(cfg).encode([synth(w, h, seed)])
    frames = decode_annexb_independent(stream)
    assert len(frames) == 1
    for c in range(3):
        assert (frames[0][c] == recons[0][c]).all(), c


def test_independent_decode_wpp_and_multiframe():
    from wrenc_tpu.encoder import Encoder
    cfg = EncoderConfig(width=64, height=64, qp=30,
                        entropy_coding_sync_enabled=True,
                        entry_point_offsets_present=True)
    fr = [synth(64, 64, 5), synth(64, 64, 6)]
    stream, recons = Encoder(cfg).encode(fr)
    frames = decode_annexb_independent(stream)
    assert len(frames) == 2
    for k in range(2):
        for c in range(3):
            assert (frames[k][c] == recons[k][c]).all(), (k, c)


def test_oracle_catches_missing_syntax_element(monkeypatch):
    """Regression for round 1's class of bug: drop mts_idx from the
    encoder and the independent decoder must detect the desync (the
    shared-source round trip would not)."""
    from wrenc_tpu.encoder import Encoder
    from wrenc_tpu.entropy.syntax import SliceSyntax
    from wrenc_tpu.core.tables import SE

    orig = SliceSyntax._bin

    def drop_mts(self, se, inc, v=None):
        if se == SE.MtsIdx:
            return 0          # silently skip the element, like round 1
        return orig(self, se, inc, v)

    monkeypatch.setattr(SliceSyntax, "_bin", drop_mts)
    cfg = EncoderConfig(width=64, height=64, qp=27)
    frame = synth(64, 64, 7)
    stream, recons = Encoder(cfg, use_native=False).encode([frame])
    desynced = False
    try:
        frames = decode_annexb_independent(stream)
        for c in range(3):
            if not (frames[0][c] == recons[0][c]).all():
                desynced = True
    except (ConformanceError, AssertionError, IndexError, ValueError):
        desynced = True
    assert desynced, "oracle failed to catch a dropped syntax element"


def test_per_bin_trace_alignment():
    """The encoder trace and the independent decoder trace must agree
    bin-for-bin (the per-bin debug dump, bool_coder.rs:275-286 role)."""
    import wrenc_tpu.entropy.cabac as cab
    from wrenc_tpu.encoder import Encoder

    enc_trace = []
    orig_init = cab.CabacEncoder.__init__

    def patched(self, wtr, trace=None):
        orig_init(self, wtr, trace=enc_trace)

    cab.CabacEncoder.__init__ = patched
    try:
        cfg = EncoderConfig(width=64, height=64, qp=27)
        stream, _ = Encoder(cfg, use_native=False).encode([synth(64, 64, 8)])
    finally:
        cab.CabacEncoder.__init__ = orig_init

    dec_trace = []
    decode_annexb_independent(stream, trace=dec_trace)
    assert len(enc_trace) == len(dec_trace)
    for i, (e, d) in enumerate(zip(enc_trace, dec_trace)):
        assert e == d[:3], (i, e, d)
