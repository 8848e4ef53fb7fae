"""TPU wavefront search: conformant round trip + quality sanity vs scalar."""
import numpy as np
import pytest

from wrenc_tpu.core.config import EncoderConfig
from wrenc_tpu.decoder import decode_annexb
from wrenc_tpu.encoder import Encoder
from wrenc_tpu.search import WavefrontSearch

from tests.test_entropy_roundtrip import synth_frame


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255 ** 2 / mse)


@pytest.mark.parametrize("qp", [27, 37])
def test_wavefront_roundtrip(qp):
    cfg = EncoderConfig(width=64, height=64, qp=qp)
    frame = synth_frame(64, 64, seed=qp)
    enc = Encoder(cfg, search=WavefrontSearch(cfg))
    stream, recons = enc.encode([frame])
    frames = decode_annexb(stream)
    for c in range(3):
        assert (frames[0][c] == recons[0][c]).all(), c


def test_wavefront_quality_reasonable():
    """Wavefront result should be within ~1 dB / 30% bytes of the scalar
    golden encoder on a textured frame."""
    cfg = EncoderConfig(width=64, height=64, qp=32)
    frame = synth_frame(64, 64, seed=77)
    sw, sr = Encoder(cfg, search=WavefrontSearch(cfg)).encode([frame])
    gw, gr = Encoder(cfg).encode([frame])
    p_w = psnr(sr[0][0], frame[0])
    p_g = psnr(gr[0][0], frame[0])
    assert p_w > p_g - 1.5, (p_w, p_g)
    assert len(sw) < len(gw) * 1.4 + 200, (len(sw), len(gw))


def test_frame_sharded_encode_matches_single():
    """Frame-data-parallel stage A over a device mesh must produce the
    identical bitstream (frames are independent in all-intra)."""
    import jax
    import numpy as np
    from jax.sharding import Mesh
    from wrenc_tpu.core.config import EncoderConfig
    from wrenc_tpu.encoder import Encoder
    from wrenc_tpu.search import WavefrontSearch

    devs = jax.devices()
    if len(devs) < 2:
        import pytest
        pytest.skip("needs multiple devices")
    rng = np.random.default_rng(9)
    W, H = 96, 64
    frames = []
    yy, xx = np.mgrid[0:H, 0:W]
    for i in range(3):  # 3 frames on a wider mesh -> exercises padding
        y = np.clip(np.sin(xx / 7 + i) * 60 + np.cos(yy / 9) * 50 + 128
                    + rng.integers(-5, 6, (H, W)), 0, 255).astype(np.uint8)
        cb = (y[::2, ::2] // 2 + 50).astype(np.uint8)
        cr = (210 - y[::2, ::2] // 2).astype(np.uint8)
        frames.append((y, cb, cr))
    cfg = EncoderConfig(width=W, height=H, qp=30)
    mesh = Mesh(np.array(devs), ("frame",))
    s1, _ = Encoder(cfg, search=WavefrontSearch(cfg, mesh=mesh)) \
        .encode(frames)
    s2, _ = Encoder(cfg, search=WavefrontSearch(cfg)).encode(frames)
    assert s1 == s2


def test_row_band_sharded_encode_matches_single():
    """Production CTU-row-band sharding: stage A over a (frame, row) mesh
    with the REAL cost model and ppermute halo exchange must produce the
    identical bitstream to the single-device encoder."""
    import jax
    import numpy as np
    from jax.sharding import Mesh
    from wrenc_tpu.core.config import EncoderConfig
    from wrenc_tpu.encoder import Encoder
    from wrenc_tpu.search import WavefrontSearch

    devs = jax.devices()
    if len(devs) < 8:
        import pytest
        pytest.skip("needs 8 devices")
    rng = np.random.default_rng(11)
    W, H = 96, 128   # 4 CTU rows -> 4 row bands
    frames = []
    yy, xx = np.mgrid[0:H, 0:W]
    for i in range(3):
        y = np.clip(np.sin(xx / 6 + i) * 70 + np.cos(yy / 11) * 40 + 120
                    + rng.integers(-6, 7, (H, W)), 0, 255).astype(np.uint8)
        cb = (y[::2, ::2] // 2 + 50).astype(np.uint8)
        cr = (210 - y[::2, ::2] // 2).astype(np.uint8)
        frames.append((y, cb, cr))
    cfg = EncoderConfig(width=W, height=H, qp=30)
    mesh = Mesh(np.array(devs[:8]).reshape(2, 4), ("frame", "row"))
    s1, r1 = Encoder(cfg, search=WavefrontSearch(cfg, mesh=mesh)) \
        .encode(frames)
    s2, r2 = Encoder(cfg, search=WavefrontSearch(cfg)).encode(frames)
    assert s1 == s2
    for a, b in zip(r1, r2):
        for pa, pb in zip(a, b):
            assert (pa == pb).all()


@pytest.mark.parametrize("rd_commit", [False, True])
def test_commit_mode_redecision_roundtrip(rd_commit):
    """Both commit paths (stage-A modes as-is vs commit-time re-decision
    on the true reconstruction) must yield conformant streams; re-decision
    must not lose RD quality (cost = ssd + lam*bits at the search lambda)."""
    cfg = EncoderConfig(width=64, height=64, qp=30)
    frame = synth_frame(64, 64, seed=5)
    ws = WavefrontSearch(cfg, rd_commit=rd_commit)
    stream, recons = Encoder(cfg, search=ws).encode([frame])
    dec = decode_annexb(stream)
    for c in range(3):
        assert (dec[0][c] == recons[0][c]).all(), c


def test_rd_commit_improves_lagrangian_cost():
    """Re-decision optimizes ssd + lam*rate; on real-ish content the
    realized Lagrangian cost (true SSD + lam*8*bytes) should not regress."""
    cfg = EncoderConfig(width=64, height=64, qp=30)
    frame = synth_frame(64, 64, seed=11)

    def run(rd):
        ws = WavefrontSearch(cfg, rd_commit=rd)
        stream, recons = Encoder(cfg, search=ws).encode([frame])
        ssd = sum(((recons[0][c].astype(np.int64)
                    - frame[c].astype(np.int64)) ** 2).sum() for c in range(3))
        return ssd, len(stream), ws.lam

    ssd0, b0, lam = run(False)
    ssd1, b1, _ = run(True)
    cost0 = ssd0 + lam * 8 * b0
    cost1 = ssd1 + lam * 8 * b1
    assert cost1 <= cost0 * 1.02, (cost0, cost1)


def test_multihost_smoke():
    """Two jax.distributed CPU processes, (frame=2, row=4) global mesh:
    the row-band halo exchange crosses the process boundary and results
    must exactly match a single-device run (SURVEY.md §4's multi-host
    testing technique)."""
    import os
    import subprocess
    import sys
    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "multihost_smoke.py")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)       # workers set their own
    env.pop("XLA_FLAGS", None)
    env["SMOKE_PORT"] = "53431"
    out = subprocess.run([sys.executable, script], env=env,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "multihost smoke PASSED" in out.stdout
