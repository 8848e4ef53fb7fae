import os, sys, time
import numpy as np
from wrenc_tpu.tools.evaluate import load_clip_yuv
from wrenc_tpu.core.config import EncoderConfig
from wrenc_tpu.search import WavefrontSearch

n = int(sys.argv[1])
frames = load_clip_yuv("/root/reference/assets/bus_352x288_30fps_30fr.mp4", 30)
while len(frames) < n:
    frames = frames + frames
frames = frames[:n]
cfg = EncoderConfig(width=352, height=288, qp=32)
ws = WavefrontSearch(cfg, commit_engine='device')
# warmup (compile)
ws.encode_frames(frames)
best = None
for _ in range(2):
    ws.phase_times = {}
    t0 = time.perf_counter()
    ws.encode_frames(frames)
    dt = time.perf_counter() - t0
    if best is None or dt < best[0]:
        best = (dt, dict(ws.phase_times))
dt, ph = best
print(f"n={n} group={os.environ.get('WRENC_COMMIT_GROUP','16')} "
      f"wall={dt:.2f}s fps={n/dt:.3f}")
print("phases:", {k: round(v,2) for k,v in ph.items()})
