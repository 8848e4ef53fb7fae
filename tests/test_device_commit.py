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
