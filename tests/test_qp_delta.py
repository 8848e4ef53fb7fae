"""Nonzero cu_qp_delta end-to-end: per-QG (== CTU) QP signalling with
spec 8.7.1 QP prediction (quantizer.rs:95-234).

The qp_delta_pattern encoder mode quantizes each CTU at its own target
QpY and the syntax layer signals delta = target - predicted QP. All
three decoders (Python shipped, independent refdec, native C++) must
reproduce the encoder's reconstruction byte-exactly, which proves the
prediction chain (qP_Y_PREV + the CTB-row-start above-QG case) matches
between encode and decode."""
import numpy as np
import pytest

from wrenc_tpu.core.config import EncoderConfig
from wrenc_tpu.encoder import Encoder
from wrenc_tpu.search import WavefrontSearch
from wrenc_tpu.decoder import decode_annexb
from wrenc_tpu.conformance.refdec import decode_annexb_independent

from tests.test_entropy_roundtrip import synth_frame


def _check_stream(stream, recons):
    for dec in (decode_annexb(stream, use_native=False),
                decode_annexb_independent(stream),
                decode_annexb(stream, use_native=True)):
        assert len(dec) == len(recons)
        for got, want in zip(dec, recons):
            for c in range(3):
                assert (np.asarray(got[c], np.uint8)
                        == np.asarray(want[c], np.uint8)).all()


@pytest.mark.parametrize("w,h,qp,pattern", [
    (96, 64, 32, (-3, 0, 4)),       # 3x2 CTUs: row-start prediction hit
    (64, 96, 27, (5, -5)),          # 2x3 CTUs, alternating +-5
    (64, 64, 38, (7,)),             # constant offset: every delta nonzero
])
def test_qp_delta_roundtrip(w, h, qp, pattern):
    cfg = EncoderConfig(width=w, height=h, qp=qp,
                        qp_delta_pattern=pattern)
    frames = [synth_frame(w, h, seed=11), synth_frame(w, h, seed=12)]
    enc = Encoder(cfg, search=WavefrontSearch(cfg))
    stream, recons = enc.encode(frames)
    _check_stream(stream, recons)


def test_qp_delta_large_value_eg_suffix():
    """|delta| >= 5 exercises the EG0 bypass suffix of the TR(5)-prefixed
    binarization (spec 9.3.3)."""
    cfg = EncoderConfig(width=64, height=64, qp=30,
                        qp_delta_pattern=(9, -8))
    frames = [synth_frame(64, 64, seed=5)]
    enc = Encoder(cfg, search=WavefrontSearch(cfg))
    stream, recons = enc.encode(frames)
    _check_stream(stream, recons)


def test_fixed_qp_stream_unchanged_by_qg_bookkeeping():
    """The QG QP machinery must be a no-op for fixed-QP streams: the
    pattern-less encode byte-matches an encode through the same path."""
    cfg = EncoderConfig(width=64, height=64, qp=32)
    frames = [synth_frame(64, 64, seed=9)]
    s1, r1 = Encoder(cfg, search=WavefrontSearch(cfg),
                     use_native=False).encode(frames)
    _check_stream(s1, r1)
