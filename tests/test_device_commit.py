"""Prototype on-device commit wavefront vs the NumPy rank-wavefront commit.

Every numeric stage (substituted refs from the evolving reconstruction,
121 filter, prediction incl. CCLM, DCT, greedy dep-quant, dequant,
inverse, reconstruct) runs in jitted device steps; the result must be
bit-identical to WavefrontSearch._commit (trellis_commit=False)."""
import numpy as np

from wrenc_tpu.core.config import EncoderConfig
from wrenc_tpu.search import WavefrontSearch
from wrenc_tpu.search.device_commit import commit_frame_device

from tests.test_entropy_roundtrip import synth_frame


import pytest


@pytest.mark.parametrize("w,h,qp,seed", [
    (96, 64, 30, 21), (64, 64, 22, 3), (64, 96, 37, 8),
])
def test_device_commit_matches_numpy_commit(w, h, qp, seed):
    cfg = EncoderConfig(width=w, height=h, qp=qp)
    frame = synth_frame(w, h, seed=seed)
    ws = WavefrontSearch(cfg, trellis_commit=False, rd_commit=False)
    (trees, _recon) = ws.encode_frames([frame])[0]
    cus = ws._collect_cus(trees)

    # NumPy rank-wavefront commit (the reference for this prototype)
    ws.orig = [np.asarray(p, dtype=np.int32) for p in frame]
    rec_py = ws._commit(trees)
    coeffs_py = [[None if c is None else c.copy() for c in cu.coeffs]
                 for cu in cus]

    rec_dev = commit_frame_device(cfg, frame, cus)
    for c in range(3):
        assert (rec_py[c] == rec_dev[c]).all(), f"plane {c} differs"
    for cu, cp in zip(cus, coeffs_py):
        for c in range(3):
            if cp[c] is None:
                assert cu.coeffs[c] is None
            else:
                assert (cu.coeffs[c] == cp[c]).all(), (cu.x, cu.y, c)


# ---------------------------------------------------------------- RD engine
# Production on-device commit (fused lax.scan re-decision wavefront) vs the
# native C++ RdCommitter at the same operating point (refine margin 0).
# Costs compare in f32 on device vs f64 in C++, so rare near-ties may pick
# a different winner; on these synthetic frames the paths agree exactly.

@pytest.mark.parametrize("w,h,qp,seeds", [
    (96, 64, 32, (21, 4)), (64, 64, 27, (3,)), (64, 96, 37, (8, 9, 10)),
])
def test_device_rd_commit_matches_native(w, h, qp, seeds):
    from wrenc_tpu.entropy import native
    if not (native.commit_supported() and native.tree_commit_supported()):
        pytest.skip("native committer unavailable")
    cfg = EncoderConfig(width=w, height=h, qp=qp)
    frames = [synth_frame(w, h, seed=s) for s in seeds]

    ws_n = WavefrontSearch(cfg, commit_engine='native',
                           chroma_stage_a='native')
    ws_n._refine_margin = 0.0           # compare refine-free vs refine-free
    out_n = ws_n.encode_frames(frames)
    modes_n = [[(cu.x, cu.y, cu.tree, cu.luma_mode, cu.chroma_mode)
                for cu in ws_n._collect_cus(trees)] for trees, _ in out_n]
    coeffs_n = [[[None if c is None else c.copy() for c in cu.coeffs]
                 for cu in ws_n._collect_cus(trees)] for trees, _ in out_n]

    # pin the chroma stage A to the shared native path so both engines
    # decide from identical trees (the fused device chroma combines
    # costs in f32 and may flip near-ties)
    ws_d = WavefrontSearch(cfg, commit_engine='device',
                           chroma_stage_a='native')
    ws_d._refine_margin = 0.0
    assert ws_d._device_commit
    out_d = ws_d.encode_frames(frames)

    for f, ((trees_d, rec_d), (_, rec_n)) in enumerate(zip(out_d, out_n)):
        cus_d = ws_d._collect_cus(trees_d)
        for i, cu in enumerate(cus_d):
            assert (cu.x, cu.y, cu.tree, cu.luma_mode,
                    cu.chroma_mode) == modes_n[f][i], (f, i, modes_n[f][i])
            for c in range(3):
                if coeffs_n[f][i][c] is None:
                    assert cu.coeffs[c] is None
                else:
                    assert (np.asarray(cu.coeffs[c])
                            == coeffs_n[f][i][c]).all(), (f, cu.x, cu.y, c)
        for c in range(3):
            assert (np.asarray(rec_d[c]) == np.asarray(rec_n[c])).all(), \
                (f, c)


def test_device_rd_commit_roundtrip():
    from wrenc_tpu.encoder import Encoder
    from wrenc_tpu.decoder import decode_annexb

    cfg = EncoderConfig(width=64, height=64, qp=32)
    frames = [synth_frame(64, 64, seed=s) for s in (11, 12)]
    enc = Encoder(cfg, search=WavefrontSearch(cfg, commit_engine='device'))
    stream, recons = enc.encode(frames)
    dec = decode_annexb(stream)
    assert len(dec) == 2
    for k in range(2):
        for c in range(3):
            assert (dec[k][c] == recons[k][c]).all(), (k, c)


def test_device_rd_commit_refine():
    """Split refinement inside the device engine: with a huge margin every
    internal split is a refine node; the two-pass scan must (a) resolve
    every refine flag, (b) pick at least one merged leaf somewhere on
    smooth content, and (c) still produce a stream that decodes exactly to
    its own reconstruction (the pass-2 recommit makes the decisions
    self-consistent)."""
    from wrenc_tpu.encoder import Encoder
    from wrenc_tpu.decoder import decode_annexb

    cfg = EncoderConfig(width=96, height=96, qp=35)
    cfg.rate_model.split_refine_margin = 10.0      # refine everywhere
    frames = [synth_frame(96, 96, seed=s) for s in (5, 6)]
    ws = WavefrontSearch(cfg, commit_engine='device')
    enc = Encoder(cfg, search=ws)
    stream, recons = enc.encode(frames)

    dec = decode_annexb(stream)
    assert len(dec) == 2
    for k in range(2):
        for c in range(3):
            assert (dec[k][c] == recons[k][c]).all(), (k, c)


def test_device_refine_matches_native_decisions_smoke():
    """Device refine is an approximation of the native sequential
    snapshot/rollback (pass-1 costs are measured against the all-split
    reconstruction), so bit-exact agreement is not guaranteed — but on
    easy content the split/leaf decisions should coincide. Compare leaf-CU
    counts and reconstruction PSNR sanity between the engines."""
    from wrenc_tpu.entropy import native
    if not (native.commit_supported() and native.tree_commit_supported()):
        pytest.skip("native committer unavailable")
    cfg = EncoderConfig(width=96, height=64, qp=32)
    frames = [synth_frame(96, 64, seed=s) for s in (21, 4)]

    ws_n = WavefrontSearch(cfg, commit_engine='native')
    out_n = ws_n.encode_frames(frames)
    ws_d = WavefrontSearch(cfg, commit_engine='device')
    out_d = ws_d.encode_frames(frames)
    assert ws_n._refine_margin > 0 and ws_d._refine_margin > 0
    agree = total = 0
    for f in range(2):
        cus_n = ws_n._collect_cus(out_n[f][0])
        cus_d = ws_d._collect_cus(out_d[f][0])
        shapes_n = set((cu.x, cu.y, cu.log2, cu.tree) for cu in cus_n)
        shapes_d = set((cu.x, cu.y, cu.log2, cu.tree) for cu in cus_d)
        agree += len(shapes_n & shapes_d)
        total += max(len(shapes_n), len(shapes_d))
    # pass-1 phantom costs are measured against the all-split
    # reconstruction (the native re-decides sequentially), so occasional
    # near-margin flips are expected; wholesale divergence is a bug.
    # Observed on these frames: 138/145 shapes agree.
    assert agree / total >= 0.9, (agree, total)
