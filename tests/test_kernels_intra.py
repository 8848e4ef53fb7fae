"""Golden tests: batched matmul intra prediction vs the scalar spec model."""
import numpy as np
import pytest

from wrenc_tpu.kernels import intra_mats, intra_pred, refs
from wrenc_tpu.spec import intra
from wrenc_tpu.spec.avail import Availability


def _u_from_spec_arrays(left, above):
    """left: corner-inclusive (2h+1), above: (2w)."""
    return np.concatenate([left, above]).astype(np.int32)


@pytest.mark.parametrize("size", [4, 8, 16, 32])
@pytest.mark.parametrize("c_idx", [0, 1])
def test_all_modes_match_spec(size, c_idx):
    if c_idx == 1 and size == 32:
        pytest.skip("chroma max TB is 16")
    rng = np.random.default_rng(size * 10 + c_idx)
    N = 8
    us = rng.integers(0, 256, size=(N, 4 * size + 1)).astype(np.int32)
    v = intra_pred.make_v(us, size)
    out = np.asarray(intra_pred.predict_all_modes(v, size, c_idx))
    for n in range(N):
        left = us[n, :2 * size + 1]
        above = us[n, 2 * size + 1:]
        for mode in range(67):
            lf, af = intra.filter_ref_samples(left.copy(), above.copy(),
                                              size, size, c_idx, mode)
            ref = intra.predict(mode, lf, af, size, size, c_idx)
            got = out[n, mode].reshape(size, size)
            assert (got == ref).all(), (size, c_idx, mode, n)


def test_predict_modes_single():
    size = 8
    rng = np.random.default_rng(3)
    N = 16
    us = rng.integers(0, 256, size=(N, 4 * size + 1)).astype(np.int32)
    v = intra_pred.make_v(us, size)
    modes = rng.integers(0, 67, size=N).astype(np.int32)
    allp = np.asarray(intra_pred.predict_all_modes(v, size, 0))
    single = np.asarray(intra_pred.predict_modes(v, modes, size, 0))
    for n in range(N):
        assert (single[n] == allp[n, modes[n]]).all()


def test_ref_vectors_match_spec_gather():
    """Batched ref construction == spec gather+substitution per block."""
    W = H = 64
    rng = np.random.default_rng(9)
    plane = rng.integers(0, 256, size=(H, W)).astype(np.int32)
    av = Availability(W, H, 5)
    for size in (4, 8, 16):
        u, xs, ys = refs.build_ref_vectors(plane, W, H, size, 0)
        for i in range(len(xs)):
            x, y = int(xs[i]), int(ys[i])
            left, above = intra.gather_ref_samples(
                plane, x, y, size, size, (x, y), (size, size), av, 0)
            expect = np.concatenate([left, above])
            assert (u[i] == expect).all(), (size, x, y)


def test_chroma_ref_vectors():
    W = H = 64
    rng = np.random.default_rng(10)
    plane = rng.integers(0, 256, size=(H // 2, W // 2)).astype(np.int32)
    av = Availability(W, H, 5)
    size = 4
    u, xs, ys = refs.build_ref_vectors(plane, W, H, size, 1)
    for i in range(len(xs)):
        x, y = int(xs[i]), int(ys[i])
        left, above = intra.gather_ref_samples(
            plane, x, y, size, size, (x * 2, y * 2), (size * 2, size * 2),
            av, 1)
        expect = np.concatenate([left, above])
        assert (u[i] == expect).all(), (x, y)
