"""SAO CTU syntax (enc+dec, disabled by default) — capability parity with
encode_sao (ctu_encoder.rs:2611-2730, CTU hook :61-63). Syntax-only, like
the reference: the search never produces offsets and no filter is applied,
so a stream whose SAO parameters are carried (merge flags, type indices,
offsets, band positions, EO classes) must still round-trip byte-exactly.
"""
import numpy as np

from wrenc_tpu.core.config import EncoderConfig
from wrenc_tpu.entropy.structure import CtuSao


def synth(w, h, seed=1):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(((xx * 3 + yy * 2) % 256)
                + rng.integers(-12, 13, (h, w)), 0, 255).astype(np.uint8)
    cb = (y[::2, ::2] // 2 + 60).astype(np.uint8)
    cr = (255 - y[::2, ::2] // 2).astype(np.uint8)
    return y, cb, cr


def rich_sao(rng):
    """A CTU's SAO params exercising every element of the syntax."""
    s = CtuSao()
    s.type_idx = [int(rng.integers(0, 3)), int(rng.integers(0, 3))]
    for c in range(3):
        s.offset_abs[c] = [int(v) for v in rng.integers(0, 8, 4)]
        s.offset_sign[c] = [int(v) for v in rng.integers(0, 2, 4)]
        s.band_position[c] = int(rng.integers(0, 32))
    s.eo_class = [int(rng.integers(0, 4)), int(rng.integers(0, 4))]
    return s


def encode_with_sao(qp=30, seed=2):
    from wrenc_tpu.encoder import Encoder
    from wrenc_tpu.spec.encoder import ScalarEncoder

    cfg = EncoderConfig(width=96, height=64, qp=qp, sao_enabled=True)
    frame = synth(96, 64, seed)
    enc = Encoder(cfg)
    trees, recon = ScalarEncoder(cfg).encode_frame(frame)
    # decorate CTUs with SAO params: merges, all-off, band, edge
    rng = np.random.default_rng(seed)
    for i, t in enumerate(trees):
        rx = i % 3
        if rx == 1 and i % 2 == 0:
            s = CtuSao()
            s.merge_left = 1
        elif i >= 3 and i % 5 == 0:
            s = CtuSao()
            s.merge_up = 1
        else:
            s = rich_sao(rng)
        t.sao = s
    # assemble stream through the encoder's slice path
    from wrenc_tpu.bitstream import nal
    from wrenc_tpu.bitstream.headers import write_pps, write_ph, write_sps, write_vps
    out = bytearray()
    nal.write_nal(out, 1, nal.VPS_NUT, write_vps(cfg))
    nal.write_nal(out, 9, nal.SPS_NUT, write_sps(cfg))
    nal.write_nal(out, 9, nal.PPS_NUT, write_pps(cfg))
    nal.write_nal(out, 9, nal.PH_NUT, write_ph(cfg, 0))
    nal.write_nal(out, 9, nal.IDR_W_RADL, enc.encode_slice(trees))
    return bytes(out), recon, trees


def test_sao_stream_roundtrips_both_oracles():
    from wrenc_tpu.decoder import decode_annexb
    from wrenc_tpu.conformance import decode_annexb_independent

    stream, recon, trees = encode_with_sao()
    frames = decode_annexb(stream)
    for c in range(3):
        assert (frames[0][c] == recon[c].astype(np.uint8)).all(), c
    frames2 = decode_annexb_independent(stream)
    for c in range(3):
        assert (frames2[0][c] == recon[c].astype(np.uint8)).all(), c


def test_sao_params_parsed_back():
    from wrenc_tpu.decoder.decode import Decoder
    from wrenc_tpu.bitstream import nal as nal_mod
    from wrenc_tpu.bitstream.headers import parse_sps, parse_pps, parse_ph, parse_sh
    from wrenc_tpu.bitstream.bitio import BitReader
    from wrenc_tpu.entropy.cabac import CabacDecoder
    from wrenc_tpu.entropy.structure import CtNode
    from wrenc_tpu.entropy.syntax import SliceSyntax
    from wrenc_tpu.bitstream.headers import ParsedParams

    stream, recon, trees = encode_with_sao()
    p = ParsedParams()
    parsed = []
    for nut, _lid, rbsp in nal_mod.parse_annexb(stream):
        if nut == nal_mod.SPS_NUT:
            parse_sps(rbsp, p)
        elif nut == nal_mod.PPS_NUT:
            parse_pps(rbsp, p)
        elif nut == nal_mod.PH_NUT:
            parse_ph(rbsp, p)
        elif nut == nal_mod.IDR_W_RADL:
            r = BitReader(rbsp)
            parse_sh(r, p)
            assert p.sao_luma_used and p.sao_chroma_used
            cabac = CabacDecoder(r)
            syn = SliceSyntax(cabac, p, 'dec', on_cu=lambda cu: None)
            cs = 1 << p.log2_ctu_size
            idx = 0
            for cy in range(0, p.height, cs):
                for cx in range(0, p.width, cs):
                    node = CtNode(cx, cy, p.log2_ctu_size)
                    syn.code_ctu(node, first_in_slice=(idx == 0))
                    cabac.decode_terminate()
                    parsed.append(node.sao)
                    idx += 1
    assert len(parsed) == len(trees)
    for got, t in zip(parsed, trees):
        want = t.sao
        assert got.merge_left == want.merge_left
        assert got.merge_up == want.merge_up
        if not (want.merge_left or want.merge_up):
            assert got.type_idx == want.type_idx
            for c in range(3):
                ti = want.type_idx[0 if c == 0 else 1]
                if ti:
                    assert got.offset_abs[c] == want.offset_abs[c], c
                if ti == 1:
                    assert got.band_position[c] == want.band_position[c]
                    for i in range(4):
                        if want.offset_abs[c][i]:
                            assert (got.offset_sign[c][i]
                                    == want.offset_sign[c][i])
            for k in range(2):
                if want.type_idx[k] == 2:
                    assert got.eo_class[k] == want.eo_class[k]


def test_sao_with_wpp_roundtrips_both_oracles():
    """SAO parameters + WPP subsets in one stream: context checkpoints
    must carry the SAO contexts too; both oracles must byte-match."""
    from wrenc_tpu.encoder import Encoder
    from wrenc_tpu.spec.encoder import ScalarEncoder
    from wrenc_tpu.decoder import decode_annexb
    from wrenc_tpu.conformance import decode_annexb_independent
    from wrenc_tpu.bitstream import nal
    from wrenc_tpu.bitstream.headers import (write_pps, write_ph, write_sps,
                                             write_vps)

    cfg = EncoderConfig(width=96, height=96, qp=32, sao_enabled=True,
                        entropy_coding_sync_enabled=True,
                        entry_point_offsets_present=True)
    frame = synth(96, 96, seed=4)
    trees, recon = ScalarEncoder(cfg).encode_frame(frame)
    rng = np.random.default_rng(5)
    for i, t in enumerate(trees):
        t.sao = rich_sao(rng)
    enc = Encoder(cfg)
    out = bytearray()
    nal.write_nal(out, 1, nal.VPS_NUT, write_vps(cfg))
    nal.write_nal(out, 9, nal.SPS_NUT, write_sps(cfg))
    nal.write_nal(out, 9, nal.PPS_NUT, write_pps(cfg))
    nal.write_nal(out, 9, nal.PH_NUT, write_ph(cfg, 0))
    nal.write_nal(out, 9, nal.IDR_W_RADL, enc.encode_slice(trees))
    stream = bytes(out)
    for dec in (decode_annexb(stream)[0],
                decode_annexb_independent(stream)[0]):
        for c in range(3):
            assert (dec[c] == recon[c].astype(np.uint8)).all(), c
