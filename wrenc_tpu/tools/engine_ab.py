#!/usr/bin/env python3
"""A/B the native C++ commit engine vs the on-device lax.scan RD commit.

Encodes full clips at a QP ladder with both engines and reports, per
(clip, qp): stream sizes, byte-identity, PSNR, per-engine wall time, and
conformance (decode == encoder reconstruction). The native RdCommitter
is the bit-exactness oracle; the device engine compares costs in f32
(vs f64 in C++), so rare near-ties may pick a different — equally
coded — winner. The acceptance gate (round-2 VERDICT #4): byte-identical
streams, or a BD-rate-scale size delta under 0.02% with conformance
holding on both.

    PYTHONPATH=$PWD:/root/.axon_site python -m wrenc_tpu.tools.engine_ab \
        --frames 30 --qps 22,27,32,37 --out results/engine_ab.json
"""
import argparse
import json
import os
import time

import numpy as np

CLIPS = {
    "bus": "/root/reference/assets/bus_352x288_30fps_30fr.mp4",
    "mobile": "/root/reference/assets/mobile_352x288_30fps_30fr.mp4",
}


def _encode(cfg_kw, frames, engine):
    from ..core.config import EncoderConfig
    from ..encoder import Encoder
    from ..search import WavefrontSearch
    cfg = EncoderConfig(**cfg_kw)
    enc = Encoder(cfg, search=WavefrontSearch(cfg, commit_engine=engine))
    t0 = time.perf_counter()
    stream, recons = enc.encode(frames)
    dt = time.perf_counter() - t0
    return stream, recons, dt, dict(getattr(enc, 'phase_times', {}))


def _verify(stream, recons):
    from ..decoder import decode_annexb
    dec = decode_annexb(stream)
    if len(dec) != len(recons):
        return False
    for got, want in zip(dec, recons):
        for c in range(3):
            if not (np.asarray(got[c], np.uint8)
                    == np.asarray(want[c], np.uint8)).all():
                return False
    return True


def main(argv=None):
    from .evaluate import frame_psnr_avg, load_clip_yuv
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--qps", default="22,27,32,37")
    ap.add_argument("--clips", default="bus,mobile")
    ap.add_argument("--verify", action="store_true", default=True)
    ap.add_argument("--out", default="results/engine_ab.json")
    args = ap.parse_args(argv)
    qps = [int(q) for q in args.qps.split(",")]

    report = {"frames": args.frames, "points": []}
    for clip in args.clips.split(","):
        frames = load_clip_yuv(CLIPS[clip], args.frames)
        for qp in qps:
            cfg_kw = dict(width=352, height=288, qp=qp)
            row = {"clip": clip, "qp": qp}
            streams = {}
            for engine in ("native", "device"):
                stream, recons, dt, phases = _encode(cfg_kw, frames, engine)
                streams[engine] = (stream, recons)
                psnr = float(np.mean([frame_psnr_avg(r, d)["Avg"]
                                      for r, d in zip(frames, recons)]))
                row[engine] = {
                    "bytes": len(stream),
                    "psnr": round(psnr, 4),
                    "time_s": round(dt, 2),
                    "phases": {k: round(v, 3) for k, v in phases.items()},
                }
                if args.verify:
                    row[engine]["conformant"] = _verify(stream, recons)
            sn, sd = streams["native"][0], streams["device"][0]
            row["byte_identical"] = sn == sd
            row["size_delta_pct"] = round(
                100.0 * (len(sd) - len(sn)) / len(sn), 4)
            report["points"].append(row)
            print(json.dumps(row, default=str))
    ident = [p["byte_identical"] for p in report["points"]]
    deltas = [abs(p["size_delta_pct"]) for p in report["points"]]
    report["all_byte_identical"] = all(ident)
    report["max_abs_size_delta_pct"] = max(deltas) if deltas else 0.0
    # BD-rate of the device curve vs the native curve per clip (the
    # equivalence gate: |delta| < 0.02%)
    from .metrics import bd_rate
    report["bd_device_vs_native"] = {}
    for clip in args.clips.split(","):
        pts = [p for p in report["points"] if p["clip"] == clip]
        if len(pts) < 3:
            continue
        ratio = bd_rate([p["device"]["bytes"] for p in pts],
                        [p["device"]["psnr"] for p in pts],
                        [p["native"]["bytes"] for p in pts],
                        [p["native"]["psnr"] for p in pts])
        report["bd_device_vs_native"][clip] = ratio
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"all_byte_identical": report["all_byte_identical"],
                      "max_abs_size_delta_pct":
                      report["max_abs_size_delta_pct"]}))


if __name__ == "__main__":
    main()
