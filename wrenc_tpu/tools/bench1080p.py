#!/usr/bin/env python3
"""1080p-class all-intra encode benchmark (BASELINE.md target class).

Encodes N 1920x1088 frames (the bus clip upscaled when OpenCV is
available, else synthetic) through the full pipeline with WPP on (34 CTU
rows), verifies the conformance round trip, and writes
results/1080p.json: fps, per-phase times, compile time, stream size.

    PYTHONPATH=$PWD:/root/.axon_site python -m wrenc_tpu.tools.bench1080p
"""
import argparse
import json
import os
import sys
import time

import numpy as np


def frames_1080p(n, W=1920, H=1088):
    try:
        from .evaluate import load_clip_yuv
        small = load_clip_yuv(
            "/root/reference/assets/bus_352x288_30fps_30fr.mp4", n)
        if small:
            import cv2
            out = []
            for y, cb, cr in small[:n]:
                Y = cv2.resize(y, (W, H), interpolation=cv2.INTER_CUBIC)
                CB = cv2.resize(cb, (W // 2, H // 2),
                                interpolation=cv2.INTER_CUBIC)
                CR = cv2.resize(cr, (W // 2, H // 2),
                                interpolation=cv2.INTER_CUBIC)
                out.append((Y, CB, CR))
            return out
    except Exception:
        pass
    rng = np.random.default_rng(4)
    yy, xx = np.mgrid[0:H, 0:W]
    out = []
    for i in range(n):
        y = np.clip(np.sin(xx / 23 + i * .4) * 60 + np.cos(yy / 17) * 50
                    + 128 + rng.integers(-8, 9, (H, W)), 0,
                    255).astype(np.uint8)
        out.append((y, (y[::2, ::2] // 2 + 60).astype(np.uint8),
                    (220 - y[::2, ::2] // 2).astype(np.uint8)))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--size", default="1920x1088",
                    help="WxH (e.g. 3840x2176 for the 4K target class)")
    ap.add_argument("--qp", type=int, default=32)
    ap.add_argument("--out", default="results/1080p.json")
    ap.add_argument("--no-verify", action="store_true")
    args = ap.parse_args()

    from wrenc_tpu.core.config import EncoderConfig
    from wrenc_tpu.encoder import Encoder
    from wrenc_tpu.search import WavefrontSearch

    W, H = (int(v) for v in args.size.split("x"))
    cfg = EncoderConfig(width=W, height=H, qp=args.qp,
                        entropy_coding_sync_enabled=True,
                        entry_point_offsets_present=True)
    frames = frames_1080p(args.frames, W, H)
    enc = Encoder(cfg, search=WavefrontSearch(cfg))

    # compile warm-up on the SAME content: the device-commit scan
    # geometry (rank bucket, per-class caps) is content-dependent
    t0 = time.perf_counter()
    enc.encode(frames)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    stream, recons = enc.encode(frames)
    dt = time.perf_counter() - t0

    verified = None
    if not args.no_verify:
        from wrenc_tpu.decoder import decode_annexb
        dec = decode_annexb(stream)
        verified = all((dec[i][c] == recons[i][c]).all()
                       for i in range(len(frames)) for c in range(3))
        assert verified, "1080p conformance round trip FAILED"

    from .metrics import mfu_estimate
    rec = {
        "resolution": f"{W}x{H}",
        "frames": len(frames),
        "qp": args.qp,
        "wpp_rows": H // 32,
        "fps": round(len(frames) / dt, 4),
        "encode_s": round(dt, 3),
        "first_compile_s": round(compile_s, 3),
        "bytes": len(stream),
        "mfu": round(mfu_estimate(W, H, len(frames), dt), 6),
        "mfu_note": ("logical device MACs (metrics.device_mac_estimate: "
                     "stage-A sweeps exact, commit approximated as one "
                     "more sweep) / (encode wall x v5e 98.5e12 MAC/s "
                     "bf16 peak)"),
        "phases_s": {k: round(v, 3)
                     for k, v in getattr(enc, "phase_times", {}).items()},
        "conformance_roundtrip": verified,
        "platform": os.environ.get("WRENC_JAX_PLATFORM", "default"),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec), file=sys.stderr)
    tag = "4k" if W >= 3840 else "1080p"
    print(json.dumps({"metric": f"encode_fps_{tag}_qp32",
                      "value": rec["fps"], "unit": "frames/s"}))


if __name__ == "__main__":
    main()
