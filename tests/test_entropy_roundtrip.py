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
