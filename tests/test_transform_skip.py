"""Transform-skip residual coding: search toggle, syntax, both oracles.

Capability parity with encode_residual_ts (ctu_encoder.rs:2271-2610) and
its ctx derivations (bool_coder.rs:2102,2246,2292,2373): when
cfg.transform_skip_search is on, the scalar search RD-selects TS per luma
TB; streams with TS blocks must decode byte-exactly in the shipped decoder
AND the independent clean-room oracle.
"""
import numpy as np
import pytest

from wrenc_tpu.core.config import EncoderConfig


def screen_frame(w, h, seed=3):
    rng = np.random.default_rng(seed)
    y = np.full((h, w), 200, np.uint8)
    for i in range(0, h, 8):
        y[i:i + 2, :] = 30
    y[:, 20:22] = 15
    y[10:40, 40:42] = 255
    glyph = (rng.integers(0, 2, (16, 16)) * 220 + 20).astype(np.uint8)
    y[24:40, 8:24] = glyph
    cb = np.full((h // 2, w // 2), 128, np.uint8)
    cr = cb.copy()
    return y, cb, cr


@pytest.fixture(scope="module")
def ts_stream():
    from wrenc_tpu.encoder import Encoder
    cfg = EncoderConfig(width=64, height=64, qp=30,
                        transform_skip_search=True)
    frame = screen_frame(64, 64)
    stream, recons = Encoder(cfg).encode([frame])
    return stream, recons


def test_ts_selected_and_shipped_decoder_matches(ts_stream):
    from wrenc_tpu.decoder.decode import Decoder
    stream, recons = ts_stream
    d = Decoder(use_native=False)
    seen = {"ts": 0}
    orig = d._reconstruct_cu

    def spy(cu):
        if cu.ts and any(cu.ts):
            seen["ts"] += 1
        return orig(cu)

    d._reconstruct_cu = spy
    frames = d.decode(bytes(stream))
    assert seen["ts"] > 0, "search never selected transform skip"
    for c in range(3):
        assert (frames[0][c] == recons[0][c]).all(), c


def test_ts_native_decoder_falls_back(ts_stream):
    """The native decoder doesn't implement TS; the wrapper must fall back
    to the Python path and still produce the right reconstruction."""
    from wrenc_tpu.decoder import decode_annexb
    stream, recons = ts_stream
    frames = decode_annexb(stream, use_native=True)
    for c in range(3):
        assert (frames[0][c] == recons[0][c]).all(), c


def test_ts_independent_oracle_matches(ts_stream):
    from wrenc_tpu.conformance import decode_annexb_independent
    stream, recons = ts_stream
    frames = decode_annexb_independent(stream)
    for c in range(3):
        assert (frames[0][c] == recons[0][c]).all(), c


def test_ts_syntax_roundtrip_chroma():
    """Direct syntax-level roundtrip of a CU with TS on all components,
    including a 32x32 luma TB (multi-sub-block forward scan)."""
    from wrenc_tpu.bitstream.bitio import BitWriter, BitReader
    from wrenc_tpu.entropy.cabac import CabacEncoder, CabacDecoder
    from wrenc_tpu.entropy.structure import CuDecision
    from wrenc_tpu.entropy.syntax import SliceSyntax

    rng = np.random.default_rng(9)
    cfg = EncoderConfig(width=32, height=32, qp=32)
    qy = rng.integers(-4, 5, (32, 32)).astype(np.int16)
    qcb = rng.integers(-3, 4, (16, 16)).astype(np.int16)
    qcr = np.zeros((16, 16), np.int16)
    qcr[3, 2] = -7
    qy[0, 0] = 25   # exercise gtx chain + remainder

    w = BitWriter()
    enc = CabacEncoder(w)
    syn = SliceSyntax(enc, cfg, 'enc')
    enc.init_slice(cfg.qp)
    cu = CuDecision(0, 0, 5, 'S', luma_mode=0, chroma_mode=0)
    cu.coeffs = [qy.copy(), qcb.copy(), qcr.copy()]
    cu.ts = [1, 1, 1]
    syn.code_transform_unit(cu)
    enc.encode_terminate(1)
    w.byte_align()

    from wrenc_tpu.bitstream.headers import ParsedParams
    pp = ParsedParams()
    pp.width, pp.height = 32, 32
    pp.slice_qp = cfg.qp
    pp.dep_quant_used = True
    r = BitReader(w.bytes())
    dec = CabacDecoder(r)
    syn2 = SliceSyntax(dec, pp, 'dec')
    dec.init_slice(cfg.qp)
    cu2 = CuDecision(0, 0, 5, 'S')
    syn2.code_transform_unit(cu2)
    assert cu2.ts == [1, 1, 1]
    assert (cu2.coeffs[0] == qy).all()
    assert (cu2.coeffs[1] == qcb).all()
    assert (cu2.coeffs[2] == qcr).all()
