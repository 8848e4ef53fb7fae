#!/usr/bin/env python3
"""Multi-device scaling measurement for the production sharded stage A.

Times the fused luma stage A (the production CTU-row-band sharding with
ppermute halos, search/wavefront.py _fused_luma_sharded_builder) on a
FIXED workload at 1/2/4/8 devices and reports scaling efficiency
t(1)/t(n). Real multi-chip hardware is unavailable in this environment
(BASELINE.json's >=80% target is approximated on the virtual CPU mesh,
as VERDICT r2 task 7 prescribes): all n virtual devices share the same
host cores, so with fixed total work the ideal is a FLAT wall time and
t(1)/t(n) isolates the sharding overhead (halo ppermute, collective
scheduling, band padding) rather than compute speedup.

Each device count runs in a fresh subprocess (the device count is fixed
at backend init). Writes results/scaling.json.
"""
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

CHILD = r'''
import json, os, sys, time
import numpy as np
import jax
from jax.sharding import Mesh

nd = int(sys.argv[1])
import wrenc_tpu  # noqa: F401  (honors WRENC_JAX_PLATFORM=cpu)
from wrenc_tpu.core.config import EncoderConfig
from wrenc_tpu.search import WavefrontSearch

W, H, F = 352, 512, 4           # fixed total work; H % (32*nd) == 0
cfg = EncoderConfig(width=W, height=H, qp=32)
devs = np.array(jax.devices()[:nd]).reshape(1, nd)
mesh = Mesh(devs, ("frame", "row")) if nd > 1 else None
ws = WavefrontSearch(cfg, mesh=mesh)
rng = np.random.default_rng(7)
frames = [tuple(rng.integers(0, 256, s, dtype=np.uint8).astype(np.uint8)
                for s in ((H, W), (H // 2, W // 2), (H // 2, W // 2)))
          for _ in range(F)]
ws.encode_frames(frames)        # warm up (compile)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    d = ws._dispatch_stage_a(frames)
    jax.tree_util.tree_map(np.asarray, d[2])   # block
    best = min(best, time.perf_counter() - t0)
print(json.dumps({"n_devices": nd, "stage_a_s": best}))
'''


def main():
    out = []
    env = dict(os.environ)
    env["WRENC_JAX_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO
    for nd in (1, 2, 4, 8):
        env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count={nd} "
                            + os.environ.get("XLA_FLAGS", ""))
        r = subprocess.run([sys.executable, "-c", CHILD, str(nd)],
                           capture_output=True, text=True, env=env,
                           cwd=REPO, timeout=1800)
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        if not line:
            print(f"n={nd} FAILED:\n{r.stderr[-2000:]}", file=sys.stderr)
            return 1
        rec = json.loads(line[-1])
        out.append(rec)
        print(f"n={nd}: stage_a {rec['stage_a_s']:.3f}s", file=sys.stderr)
    t1 = out[0]["stage_a_s"]
    for rec in out:
        rec["efficiency_vs_1dev"] = round(t1 / rec["stage_a_s"], 4)
    res = {
        "workload": "fused luma stage A, 4 frames 352x512, QP32, CPU mesh",
        "note": ("fixed total work on shared host cores: ideal is flat "
                 "time; efficiency = t(1)/t(n) isolates row-band sharding "
                 "overhead (virtual-device approximation, no real "
                 "multi-chip in this environment)"),
        "points": out,
    }
    os.makedirs(os.path.join(REPO, "results"), exist_ok=True)
    with open(os.path.join(REPO, "results", "scaling.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res["points"]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
