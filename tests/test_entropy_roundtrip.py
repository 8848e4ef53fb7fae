"""CABAC engine round-trip and full encoder->decoder conformance."""
import numpy as np
import pytest

from wrenc_tpu.bitstream.bitio import BitWriter, BitReader
from wrenc_tpu.core.config import EncoderConfig
from wrenc_tpu.core.tables import SE
from wrenc_tpu.entropy.cabac import CabacEncoder, CabacDecoder


def test_cabac_engine_roundtrip():
    rng = np.random.default_rng(42)
    ses = [SE.SplitCuFlag, SE.SigCoeffFlag, SE.IntraLumaMpmFlag,
           SE.TuYCodedFlag, SE.AbsLevelGtxFlag]
    script = []
    for _ in range(5000):
        kind = rng.integers(0, 3)
        if kind == 0:
            se = ses[rng.integers(0, len(ses))]
            script.append(("ctx", se, 0, int(rng.integers(0, 2))))
        elif kind == 1:
            script.append(("byp", int(rng.integers(0, 2))))
        else:
            script.append(("term0",))

    w = BitWriter()
    enc = CabacEncoder(w)
    enc.init_slice(32)
    for op in script:
        if op[0] == "ctx":
            enc.encode_bin(op[1], op[2], op[3])
        elif op[0] == "byp":
            enc.encode_bypass(op[1])
        else:
            enc.encode_terminate(0)
    enc.encode_terminate(1)
    w.byte_align()
    data = w.bytes()

    dec = CabacDecoder(BitReader(data))
    dec.init_slice(32)
    for i, op in enumerate(script):
        if op[0] == "ctx":
            assert dec.decode_bin(op[1], op[2]) == op[3], (i, op)
        elif op[0] == "byp":
            assert dec.decode_bypass() == op[1], (i, op)
        else:
            assert dec.decode_terminate() == 0, (i, op)
    assert dec.decode_terminate() == 1


def synth_frame(w, h, seed=0, flat=False):
    rng = np.random.default_rng(seed)
    if flat:
        y = np.full((h, w), 128, dtype=np.uint8)
    else:
        yy, xx = np.mgrid[0:h, 0:w]
        y = ((xx * 3 + yy * 2) % 256).astype(np.int32)
        y = np.clip(y + rng.integers(-12, 13, (h, w)), 0, 255).astype(np.uint8)
    cb = (y[::2, ::2] // 2 + 60).astype(np.uint8)
    cr = (255 - y[::2, ::2] // 2).astype(np.uint8)
    return y, cb, cr


@pytest.mark.parametrize("qp,seed,flat", [(32, 0, False), (37, 1, False),
                                          (22, 2, False), (32, 3, True)])
def test_encode_decode_roundtrip_64x64(qp, seed, flat):
    from wrenc_tpu.encoder import Encoder
    from wrenc_tpu.decoder import decode_annexb

    cfg = EncoderConfig(width=64, height=64, qp=qp)
    frame = synth_frame(64, 64, seed=seed, flat=flat)
    enc = Encoder(cfg)
    stream, recons = enc.encode([frame])
    frames = decode_annexb(stream)
    assert len(frames) == 1
    for c in range(3):
        assert (frames[0][c] == recons[0][c]).all(), \
            f"component {c} mismatch: {np.abs(frames[0][c].astype(int) - recons[0][c].astype(int)).max()}"


def test_two_frames_roundtrip():
    from wrenc_tpu.encoder import Encoder
    from wrenc_tpu.decoder import decode_annexb

    cfg = EncoderConfig(width=64, height=32, qp=30)
    f0 = synth_frame(64, 32, seed=5)
    f1 = synth_frame(64, 32, seed=6)
    stream, recons = Encoder(cfg).encode([f0, f1])
    frames = decode_annexb(stream)
    assert len(frames) == 2
    for k in range(2):
        for c in range(3):
            assert (frames[k][c] == recons[k][c]).all(), (k, c)


def test_mts_idx_emitted_and_parsed(monkeypatch):
    """mts_idx must be emitted for non-DC-only luma TBs (VTM expects it:
    sps_explicit_mts_intra_enabled=1; reference ctu_encoder.rs:1292-1319)
    and parsed identically by the pure-Python decoder."""
    from wrenc_tpu.encoder import Encoder
    from wrenc_tpu.decoder import decode_annexb
    from wrenc_tpu.entropy.cabac import CabacEncoder

    counts = {"mts": 0}
    orig = CabacEncoder.encode_bin

    def spy(self, se_id, ctx_inc, bin_val):
        if se_id == SE.MtsIdx:
            counts["mts"] += 1
        return orig(self, se_id, ctx_inc, bin_val)

    monkeypatch.setattr(CabacEncoder, "encode_bin", spy)
    cfg = EncoderConfig(width=64, height=64, qp=27)
    frame = synth_frame(64, 64, seed=7)
    # force the Python syntax path so the spy sees every bin
    enc = Encoder(cfg, use_native=False) if "use_native" in \
        Encoder.__init__.__code__.co_varnames else Encoder(cfg)
    stream, recons = enc.encode([frame])
    assert counts["mts"] > 0, "no mts_idx emitted on textured content"
    # python decode path must parse it
    frames = decode_annexb(stream, use_native=False)
    for c in range(3):
        assert (frames[0][c] == recons[0][c]).all(), c


def test_mts_zero_out_suppresses_mts_idx():
    """A coded luma sub-block outside the top-left 16x16 of a 32x32 TB
    clears MtsZeroOutSigCoeffFlag -> no mts_idx (ctu_encoder.rs:2009)."""
    import numpy as np
    from wrenc_tpu.bitstream.bitio import BitWriter
    from wrenc_tpu.core.config import EncoderConfig
    from wrenc_tpu.entropy.cabac import CabacEncoder, CabacDecoder
    from wrenc_tpu.entropy.structure import CuDecision
    from wrenc_tpu.entropy.syntax import SliceSyntax
    from wrenc_tpu.bitstream.bitio import BitReader

    def code_one(qy):
        cfg = EncoderConfig(width=32, height=32, qp=32)
        w = BitWriter()
        cab = CabacEncoder(w)
        syn = SliceSyntax(cab, cfg, 'enc')
        cab.init_slice(cfg.qp)
        cu = CuDecision(0, 0, 5, 'S', luma_mode=0, chroma_mode=0)
        cu.coeffs = [qy, np.zeros((16, 16), np.int16),
                     np.zeros((16, 16), np.int16)]
        syn.code_transform_unit(cu)
        return syn.mts_zero_out, syn.mts_dc_only

    # coeff only inside 16x16 -> zero-out survives, not DC-only
    q_in = np.zeros((32, 32), np.int16)
    q_in[2, 3] = 4
    zo, dc = code_one(q_in)
    assert zo and not dc

    # coeff outside 16x16 -> zero-out cleared
    q_out = np.zeros((32, 32), np.int16)
    q_out[2, 3] = 4
    q_out[20, 20] = 4
    zo, dc = code_one(q_out)
    assert not zo and not dc

    # DC-only -> mts_dc_only stays set
    q_dc = np.zeros((32, 32), np.int16)
    q_dc[0, 0] = 4
    zo, dc = code_one(q_dc)
    assert zo and dc


def test_cu_qp_delta_full_binarization():
    """cu_qp_delta_abs codes the complete TR(5)+EG0+sign binarization
    (spec 9.3.3): a nonzero delta must parse to the right value and
    update the QG's QpY (spec 8.7.1), not desync."""
    import numpy as np
    from wrenc_tpu.bitstream.bitio import BitWriter, BitReader
    from wrenc_tpu.bitstream.headers import ParsedParams
    from wrenc_tpu.core.config import EncoderConfig
    from wrenc_tpu.entropy.cabac import CabacEncoder, CabacDecoder
    from wrenc_tpu.entropy.structure import CuDecision
    from wrenc_tpu.entropy.syntax import SliceSyntax

    for delta in (0, 3, -7, 11):
        cfg = EncoderConfig(width=32, height=32, qp=32)
        w = BitWriter()
        enc = CabacEncoder(w)
        syn = SliceSyntax(enc, cfg, 'enc')
        enc.init_slice(cfg.qp)
        cu = CuDecision(0, 0, 5, 'S', luma_mode=0, chroma_mode=0)
        q = np.zeros((32, 32), np.int16)
        q[0, 1] = 4
        cu.coeffs = [q, np.zeros((16, 16), np.int16),
                     np.zeros((16, 16), np.int16)]
        cu.qp_delta = delta
        syn.code_transform_unit(cu)
        enc.encode_terminate(1)
        w.byte_align()

        pp = ParsedParams()
        pp.width, pp.height = 32, 32
        pp.slice_qp = cfg.qp
        pp.dep_quant_used = True
        dec = CabacDecoder(BitReader(w.bytes()))
        syn2 = SliceSyntax(dec, pp, 'dec')
        dec.init_slice(cfg.qp)
        cu2 = CuDecision(0, 0, 5, 'S')
        syn2.code_transform_unit(cu2)
        assert cu2.qp_delta == delta
        # the parsed delta updates the QG's QpY per spec 8.7.1
        assert syn2.cur_qp_y == (cfg.qp + delta + 64) % 64
