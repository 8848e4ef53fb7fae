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
import sys
from wrenc_tpu.tools.evaluate import load_clip_yuv
from wrenc_tpu.tools import yuv
frames = load_clip_yuv(sys.argv[1], int(sys.argv[2]))
assert frames, "clip decode failed"
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
