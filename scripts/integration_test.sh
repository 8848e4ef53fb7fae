#!/usr/bin/env bash
# Integration test: encode the bundled bus clip and verify the bitstream
# decodes bit-exactly to the encoder's own reconstruction (the conformance
# oracle role VTM plays for the reference, scripts/intergration_test.sh).
set -euo pipefail
cd "$(dirname "$0")/.."

CLIP=${CLIP:-/root/reference/assets/bus_352x288_30fps_30fr.mp4}
QP=${QP:-20}
FRAMES=${FRAMES:-4}
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT

export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
# Conformance is platform-independent; default to CPU so this never
# contends with a TPU job (the axon tunnel worker crashes if two
# processes attach). Set WRENC_JAX_PLATFORM=axon to force TPU.
export WRENC_JAX_PLATFORM=${WRENC_JAX_PLATFORM:-cpu}
PY=${PY:-python}

$PY - "$CLIP" "$FRAMES" "$TMP/in.yuv" <<'PYEOF'
import os
import sys
from wrenc_tpu.tools import yuv
frames = None
if os.path.exists(sys.argv[1]):
    try:
        from wrenc_tpu.tools.evaluate import load_clip_yuv
        frames = load_clip_yuv(sys.argv[1], int(sys.argv[2]))
    except Exception:
        frames = None
if not frames:
    # no bundled clip (e.g. CI containers): deterministic synthetic
    # content — the conformance oracle is content-independent
    import numpy as np
    rng = np.random.default_rng(11)
    W, H = 352, 288
    yy, xx = np.mgrid[0:H, 0:W]
    frames = []
    for i in range(int(sys.argv[2])):
        y = np.clip(np.sin(xx / 13 + i * .4) * 55
                    + np.cos(yy / 9 - i * .1) * 45 + 128
                    + rng.integers(-12, 13, (H, W)), 0,
                    255).astype(np.uint8)
        frames.append((y, (y[::2, ::2] // 2 + 64).astype(np.uint8),
                       (200 - y[::2, ::2] // 2).astype(np.uint8)))
yuv.write_yuv420(sys.argv[3], frames)
PYEOF

$PY -m wrenc_tpu.tools.encode -i "$TMP/in.yuv" -o "$TMP/out.vvc" \
    -r "$TMP/rec.yuv" --input-size 352x288 --output-size 352x288 \
    --num-pictures "$FRAMES" --qp "$QP"
$PY -m wrenc_tpu.tools.decode -i "$TMP/out.vvc" -o "$TMP/dec.yuv"
cmp "$TMP/rec.yuv" "$TMP/dec.yuv"
# Second, independent oracle: clean-room parser sharing no code with the
# encoder's syntax layer (wrenc_tpu/conformance) — catches syntax-layer
# misunderstandings the shared-source round trip cannot.
$PY -m wrenc_tpu.tools.decode --independent -i "$TMP/out.vvc" \
    -o "$TMP/dec_ind.yuv"
cmp "$TMP/rec.yuv" "$TMP/dec_ind.yuv"
echo "integration test PASSED (qp=$QP frames=$FRAMES," \
     "$(stat -c%s "$TMP/out.vvc") bytes, both oracles byte-exact)"
