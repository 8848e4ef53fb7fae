"""Native (C++) backend equality vs Python reference implementations."""
import numpy as np
import pytest

from wrenc_tpu.core.config import EncoderConfig, RateModelConfig
from wrenc_tpu.entropy import native
from wrenc_tpu.kernels import np_ops, quantize as kq
from wrenc_tpu.spec import quant, transform

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native backend unavailable")


@pytest.mark.parametrize("log2", [2, 3, 4, 5])
def test_native_trellis_equals_numpy(log2):
    rng = np.random.default_rng(log2)
    n = 1 << log2
    res = rng.integers(-150, 151, size=(4, n, n)).astype(np.int32)
    t = np.stack([transform.forward(r) for r in res])
    qpar = quant.derive_quant_params(30, log2, log2, dep_quant=True,
                                     transform_skip=False)
    lam = np.asarray(kq.lam_dq_table(RateModelConfig(), 30, True))
    q_np = np_ops.trellis_depquant_np(t, qpar.ls, qpar.bd_shift, lam, log2)
    q_c = native.trellis_quant_native(t, qpar.ls, qpar.bd_shift, lam, log2)
    assert (q_np == q_c).all()


@pytest.mark.parametrize("log2", [2, 4])
def test_native_greedy_equals_numpy(log2):
    rng = np.random.default_rng(log2 + 10)
    n = 1 << log2
    res = rng.integers(-150, 151, size=(4, n, n)).astype(np.int32)
    t = np.stack([transform.forward(r) for r in res])
    qpar = quant.derive_quant_params(34, log2, log2, dep_quant=True,
                                     transform_skip=False)
    lam = np.asarray(kq.lam_dq_table(RateModelConfig(), 34, False))
    q_np = np_ops.greedy_depquant_np(t, qpar.ls, qpar.bd_shift, lam, log2)
    q_c = native.greedy_quant_native(t, qpar.ls, qpar.bd_shift, lam, log2)
    assert (q_np == q_c).all()


@pytest.mark.parametrize("qp", [24, 33])
def test_native_slice_coder_byte_equal(qp):
    from wrenc_tpu.encoder import Encoder
    from wrenc_tpu.search import WavefrontSearch
    from tests.test_entropy_roundtrip import synth_frame

    cfg = EncoderConfig(width=64, height=64, qp=qp)
    frame = synth_frame(64, 64, seed=qp)
    ws = WavefrontSearch(cfg)
    trees, _ = ws.encode_frame(frame)
    pb = Encoder(cfg, use_native=False).encode_slice(trees)
    nb = Encoder(cfg, use_native=True).encode_slice(trees)
    assert pb == nb


def test_native_decoder_matches_python_oracle():
    """The C++ fast-path decoder must reproduce the Python conformance
    oracle exactly (normal + WPP streams, CCLM-rich content)."""
    import numpy as np
    from wrenc_tpu.core.config import EncoderConfig
    from wrenc_tpu.decoder import decode_annexb
    from wrenc_tpu.encoder import Encoder
    from wrenc_tpu.entropy import native
    from wrenc_tpu.search import WavefrontSearch

    if not native.available():
        import pytest
        pytest.skip("no native library")
    rng = np.random.default_rng(21)
    W, H = 96, 96
    yy, xx = np.mgrid[0:H, 0:W]
    frames = []
    for i in range(2):
        y = np.clip(np.sin(xx / 6 + i) * 70 + np.cos(yy / 9) * 60 + 128
                    + rng.integers(-15, 16, (H, W)), 0, 255).astype(np.uint8)
        cb = np.clip(y[::2, ::2] // 2 + 40
                     + rng.integers(-4, 5, (H // 2, W // 2)),
                     0, 255).astype(np.uint8)
        cr = np.clip(230 - y[::2, ::2] * 3 // 4
                     + rng.integers(-4, 5, (H // 2, W // 2)),
                     0, 255).astype(np.uint8)
        frames.append((y, cb, cr))
    for wpp in (False, True):
        cfg = EncoderConfig(width=W, height=H, qp=24)  # low QP: rich residual
        if wpp:
            cfg.entropy_coding_sync_enabled = True
            cfg.entry_point_offsets_present = True
        stream, recons = Encoder(cfg, search=WavefrontSearch(cfg)) \
            .encode(frames)
        fn = decode_annexb(stream, use_native=True)
        fp = decode_annexb(stream, use_native=False)
        for a, b in zip(fn, fp):
            for pa, pb in zip(a, b):
                assert np.array_equal(pa, pb)
        for a, b in zip(fn, recons):
            for pa, pb in zip(a, b):
                assert np.array_equal(pa, pb)
