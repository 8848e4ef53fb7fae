#!/usr/bin/env python3
"""A/B harness: encode a short clip sweep under two rate-model settings and
report BD-rate of B vs A plus encode-time ratio. CPU-safe (no TPU needed).

    WRENC_JAX_PLATFORM=cpu python tools/ab_margins.py \
        --set-b split_refine_margin=0.2 [--frames 8]
"""
import argparse
import json
import sys
import time

import numpy as np


def run_sweep(frames, qps, overrides):
    from wrenc_tpu.core.config import EncoderConfig
    from wrenc_tpu.encoder import Encoder
    from wrenc_tpu.search import WavefrontSearch
    from wrenc_tpu.tools.evaluate import frame_psnr_avg

    h, w = frames[0][0].shape
    pts = []
    t_total = 0.0
    for qp in qps:
        cfg = EncoderConfig(width=w, height=h, qp=qp)
        cfg.rate_model.apply_extra_params(overrides)
        enc = Encoder(cfg, search=WavefrontSearch(cfg))
        t0 = time.perf_counter()
        stream, recons = enc.encode(frames)
        t_total += time.perf_counter() - t0
        ps = float(np.mean([frame_psnr_avg(r, d)["Avg"]
                            for r, d in zip(frames, recons)]))
        pts.append((len(stream), ps))
        print(f"  qp{qp}: {len(stream)} B, {ps:.3f} dB", file=sys.stderr)
    return pts, t_total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clip",
                    default="/root/reference/assets/bus_352x288_30fps_30fr.mp4")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--qps", default="22,27,32,37")
    ap.add_argument("--set-a", default="")
    ap.add_argument("--set-b", required=True)
    args = ap.parse_args()

    def parse_set(s):
        return dict(kv.split("=") for kv in s.split(",") if kv)

    from wrenc_tpu.tools.evaluate import load_clip_yuv
    from wrenc_tpu.tools.metrics import bd_rate
    frames = load_clip_yuv(args.clip, args.frames)
    qps = [int(q) for q in args.qps.split(",")]

    print("warmup (jit compile)...", file=sys.stderr)
    run_sweep(frames, qps[:1], parse_set(args.set_a))

    print("config A:", args.set_a or "(defaults)", file=sys.stderr)
    pts_a, t_a = run_sweep(frames, qps, parse_set(args.set_a))
    print("config B:", args.set_b, file=sys.stderr)
    pts_b, t_b = run_sweep(frames, qps, parse_set(args.set_b))

    bd = bd_rate([p[0] for p in pts_b], [p[1] for p in pts_b],
                 [p[0] for p in pts_a], [p[1] for p in pts_a])
    # < 1.0 means B needs fewer bytes than A at equal quality
    print(json.dumps({
        "bd_rate_b_vs_a": round(bd, 5),
        "time_a_s": round(t_a, 2), "time_b_s": round(t_b, 2),
        "speedup": round(t_a / t_b, 3),
    }))


if __name__ == "__main__":
    main()
