"""Phantom scheduling in the commit-wavefront dependency ranks.

Round-5 in-scan refine resolution: a phantom (merged-leaf refine
alternative) reads only its OUTSIDE reference samples and its region's
accumulated costs — never its children's pixels — so _cu_ranks places it
at max(neighbour windows + 1, own region max): the SAME step as its
region's last contributor. Phantoms write the grid (dependents decide
against the resolved reconstruction) with zero rank-depth inflation vs
a phantom-free schedule. The C twin (wrenc_cu_ranks2) must agree with
the NumPy fallback exactly.
"""
import numpy as np
import pytest

from wrenc_tpu.core.config import EncoderConfig
from wrenc_tpu.search import WavefrontSearch
from wrenc_tpu.search.device_commit import (_collect_leaf_cus, _cu_ranks)

from tests.test_entropy_roundtrip import synth_frame


def _trees_with_phantoms(w, h, qp, seed, margin):
    cfg = EncoderConfig(width=w, height=h, qp=qp)
    cfg.rate_model.split_refine_margin = margin
    ws = WavefrontSearch(cfg, commit_engine='native',
                         chroma_stage_a='native')
    frame = synth_frame(w, h, seed=seed)
    # run only the decide phases: dispatch stage A, then build trees
    dispatched = ws._dispatch_stage_a([frame])
    _, all_trees, _ = ws._decide_chunk([frame], dispatched)
    return all_trees[0]


def _numpy_ranks(cus, W, H, log2_ctu):
    """Force the NumPy fallback by monkeypatching native availability."""
    from wrenc_tpu.entropy import native
    orig = native.available
    native.available = lambda: False
    try:
        return _cu_ranks(cus, W, H, log2_ctu)
    finally:
        native.available = orig


@pytest.mark.parametrize("w,h,seed", [(96, 96, 5), (96, 64, 21)])
def test_native_matches_numpy_with_phantoms(w, h, seed):
    trees = _trees_with_phantoms(w, h, 35, seed, margin=10.0)
    cus = _collect_leaf_cus(trees)
    assert any(ph for _, ph in cus), "margin=10 should refine everywhere"
    r_native = _cu_ranks(cus, w, h, 5)
    r_numpy = _numpy_ranks(cus, w, h, 5)
    assert (np.asarray(r_native) == np.asarray(r_numpy)).all()


def test_phantom_ranks_do_not_inflate_depth():
    """Max rank with phantoms scheduled == max rank of the committed CUs
    alone (phantoms share their region's last contributor's step), and
    every phantom ranks at or after all of its region's children."""
    w, h = 96, 96
    trees = _trees_with_phantoms(w, h, 35, 5, margin=10.0)
    cus = _collect_leaf_cus(trees)
    ranks = np.asarray(_cu_ranks(cus, w, h, 5))
    live = [i for i, (cu, ph) in enumerate(cus) if not ph]
    phs = [i for i, (cu, ph) in enumerate(cus) if ph]
    assert phs
    assert ranks.max() == ranks[live].max(), \
        "phantom scheduling must not lengthen the critical chain"
    # each phantom at/after every committed CU inside its region
    for i in phs:
        cu = cus[i][0]
        s = 1 << cu.log2
        for j in live:
            c = cus[j][0]
            if cu.x <= c.x < cu.x + s and cu.y <= c.y < cu.y + s:
                assert ranks[i] >= ranks[j], (i, j)


def test_phantom_free_schedule_unchanged():
    """With margin 0 (no refines) the new phantom formula is inert: the
    rank stream equals the committed-only schedule by construction."""
    trees = _trees_with_phantoms(96, 64, 32, 4, margin=0.0)
    cus = _collect_leaf_cus(trees)
    assert not any(ph for _, ph in cus)
    r1 = np.asarray(_cu_ranks(cus, 96, 64, 5))
    r2 = np.asarray(_numpy_ranks(cus, 96, 64, 5))
    assert (r1 == r2).all()
