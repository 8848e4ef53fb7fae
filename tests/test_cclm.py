"""CCLM: batched kernel vs spec scalar, and wavefront round-trip with
CCLM-favourable (luma-correlated chroma) content."""
import numpy as np
import pytest

from wrenc_tpu.core.config import EncoderConfig
from wrenc_tpu.decoder import decode_annexb
from wrenc_tpu.encoder import Encoder
from wrenc_tpu.kernels import np_ops, refs
from wrenc_tpu.search import WavefrontSearch
from wrenc_tpu.spec import intra
from wrenc_tpu.spec.avail import Availability


@pytest.mark.parametrize("cs", [4, 8, 16])
@pytest.mark.parametrize("mode", [81, 82, 83])
def test_cclm_batch_matches_spec(cs, mode):
    rng = np.random.default_rng(cs * 100 + mode)
    W, H = 96, 64
    luma = rng.integers(0, 256, (H, W)).astype(np.int64)
    cb = rng.integers(0, 256, (H // 2, W // 2)).astype(np.int64)
    av = Availability(W, H, 5)
    masks = refs.avail_masks(W, H, cs, 1, 5)
    xs, ys = refs.block_grid(W, H, cs, 1)
    batch = np_ops.predict_cclm_np(mode, luma, cb, xs, ys, cs, masks)
    for i, (cx, cy) in enumerate(zip(xs, ys)):
        ref = intra.predict_cclm(mode, luma, cb, int(cx), int(cy), cs, cs,
                                 (2 * int(cx), 2 * int(cy)), av, 32)
        assert np.array_equal(ref, batch[i]), (cs, mode, cx, cy)


def _correlated_frame(W, H, seed):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    y = np.clip(np.sin(xx / 9) * 60 + np.cos(yy / 13) * 50 + 128
                + rng.integers(-6, 7, (H, W)), 0, 255).astype(np.uint8)
    cb = np.clip(y[::2, ::2] // 2 + 40
                 + rng.integers(-3, 4, (H // 2, W // 2)),
                 0, 255).astype(np.uint8)
    cr = np.clip(255 - y[::2, ::2] * 3 // 4
                 + rng.integers(-3, 4, (H // 2, W // 2)),
                 0, 255).astype(np.uint8)
    return y, cb, cr


def test_wavefront_cclm_roundtrip():
    W, H = 96, 64
    frames = [_correlated_frame(W, H, s) for s in (3, 4)]
    cfg = EncoderConfig(width=W, height=H, qp=30)
    search = WavefrontSearch(cfg)
    enc = Encoder(cfg, search=search)
    stream, recons = enc.encode(frames)

    # CCLM must actually be selected on this content
    trees_recon = search.encode_frames(
        [[np.asarray(p, np.int32) for p in frames[0]]])
    modes = []

    def walk(n):
        if n.split:
            for c in n.children:
                walk(c)
        elif n.cu is not None and n.cu.tree in ('S', 'C'):
            modes.append(n.cu.chroma_mode)

    for t in trees_recon[0][0]:
        walk(t)
    assert any(m >= 81 for m in modes), "CCLM never chosen"

    dec = decode_annexb(stream)
    assert len(dec) == len(recons)
    for fa, fb in zip(recons, dec):
        for a, b in zip(fa, fb):
            assert np.array_equal(a, b)


def test_device_cclm_matches_numpy():
    """The jnp CCLM kernel must be bit-exact vs np_ops.predict_cclm_np
    across modes, sizes, and availability geometries (picture corners,
    edges, CTU-row boundaries)."""
    import numpy as np
    import jax.numpy as jnp
    from wrenc_tpu.kernels import intra_pred, np_ops, refs

    rng = np.random.default_rng(17)
    W, H = 96, 64
    luma = rng.integers(0, 256, (H, W)).astype(np.int32)
    chroma = rng.integers(0, 256, (H // 2, W // 2)).astype(np.int32)
    for cs in (4, 8, 16):
        xs, ys = refs.block_grid(W, H, cs, 1)
        masks = refs.avail_masks(W, H, cs, 1, 5)
        for mode in (81, 82, 83):
            ref = np_ops.predict_cclm_np(mode, luma, chroma, xs, ys, cs,
                                         masks)
            dev = np.asarray(intra_pred.predict_cclm(
                mode, jnp.asarray(luma), jnp.asarray(chroma),
                xs, ys, cs, masks))
            assert (ref == dev).all(), (cs, mode)
