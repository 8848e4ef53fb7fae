#!/usr/bin/env python3
"""Profile the device RD-commit scan on the real chip.

Encodes N bus CIF frames with the device engine under
jax.profiler.trace, then parses the xplane proto and reports the
'XLA Ops' self-time grouped by op name — the per-step kernel-count /
op-mix evidence that drives the fusion work (CLAUDE.md round-4 recipe:
sum durations on the compute line, exclude %while, async copy-start
durations overcount).

    PYTHONPATH=$PWD:/root/.axon_site python tools/profile_commit_step.py
"""
import collections
import glob
import os
import sys

import numpy as np


def main():
    n = int(os.environ.get('PROF_FRAMES', '8'))
    outdir = os.environ.get('PROF_DIR', '/tmp/wrenc_prof')
    import jax
    from wrenc_tpu.tools.evaluate import load_clip_yuv
    from wrenc_tpu.core.config import EncoderConfig
    from wrenc_tpu.search import WavefrontSearch

    frames = load_clip_yuv(
        "/root/reference/assets/bus_352x288_30fps_30fr.mp4", n)
    cfg = EncoderConfig(width=352, height=288, qp=32)
    ws = WavefrontSearch(cfg, commit_engine='device')
    disp = ws._dispatch_stage_a(frames)
    batch, all_trees, devp = ws._decide_chunk(frames, disp)

    # warm (compile) once outside the trace
    import copy
    trees_w = copy.deepcopy(all_trees)
    ws._commit_all(trees_w, batch, devp)

    with jax.profiler.trace(outdir):
        ws._commit_all(all_trees, batch, devp)

    # ---- parse the xplane proto
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = sorted(glob.glob(os.path.join(
        outdir, 'plugins/profile/*/*.xplane.pb')), key=os.path.getmtime)
    if not paths:
        print("no xplane found", file=sys.stderr)
        return
    xs = xplane_pb2.XSpace()
    with open(paths[-1], 'rb') as f:
        xs.ParseFromString(f.read())
    # layout (verified on the axon vm.xplane.pb): the device plane is
    # named '/device:TPU:0' and holds the 'XLA Ops' line (the compute
    # self-time line; the 'Async XLA Ops' line overcounts overlapped
    # copy-starts — CLAUDE.md profiling recipe)
    for plane in xs.planes:
        if 'TPU' not in plane.name:
            continue
        evm = {m.id: m.name for m in plane.event_metadata.values()}
        tot = collections.Counter()
        cnt = collections.Counter()
        for line in plane.lines:
            if line.name != 'XLA Ops':
                continue
            for ev in line.events:
                name = evm.get(ev.metadata_id, '?')
                if name.startswith('%while'):
                    continue
                tot[name] += ev.duration_ps / 1e12
                cnt[name] += 1
        if not cnt:
            continue
        total = sum(tot.values())
        print(f"plane: {plane.name}  'XLA Ops' self-time {total:.3f}s  "
              f"events {sum(cnt.values())}")
        # group by op family (strip %fusion.123 -> fusion etc.)
        fam_t = collections.Counter()
        fam_c = collections.Counter()
        for name, t in tot.items():
            fam = name.lstrip('%').split('.')[0]
            fam_t[fam] += t
            fam_c[fam] += cnt[name]
        for fam, t in fam_t.most_common(25):
            print(f"  {fam:32s} {t:8.3f}s  {fam_c[fam]:7d} events  "
                  f"{t / fam_c[fam] * 1e6:8.1f} us/ev")


if __name__ == '__main__':
    main()
