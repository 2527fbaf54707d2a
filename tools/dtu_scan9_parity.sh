#!/bin/bash
# One-command DTU scan9 depth-accuracy parity check vs reference-trained
# weights (BASELINE.md north star: <=1% delta on the GT-loss / <1px / <3px
# metrics at 1152x864 D192 V5, measured the way reference/mvsnet/test.py
# measures them).
#
# Everything after data arrival is automated; the two inputs that need
# network/data access are declared up front and checked first so the
# script fails in seconds, not mid-pipeline:
#
#   DTU_DIR   — preprocessed DTU mvs_training dir (download_dataset.py dtu
#               fetches the Altizure-preprocessed archive when S3 egress +
#               boto3 exist; any mirror of the same layout works)
#   TF_CKPT   — reference TF checkpoint: either the Saver prefix
#               (tf_model_19307.ckpt) when tensorflow is importable, or an
#               .npz export made offline with
#               python -c "import numpy as np, tensorflow as tf; \
#                 r = tf.train.load_checkpoint('<prefix>'); \
#                 np.savez('ckpt.npz', **{n: r.get_tensor(n) for n in \
#                 r.get_variable_to_shape_map()})"
#
# Usage: bash tools/dtu_scan9_parity.sh <DTU_DIR> <TF_CKPT> [workdir]
set -eu
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

DTU_DIR="${1:?usage: dtu_scan9_parity.sh <DTU_DIR> <TF_CKPT> [workdir]}"
TF_CKPT="${2:?need the reference checkpoint (Saver prefix or .npz)}"
WORK="${3:-/tmp/dtu_scan9_parity}"
mkdir -p "$WORK"

[ -d "$DTU_DIR" ] || { echo "DTU_DIR $DTU_DIR not found" >&2; exit 1; }
[ -e "$TF_CKPT" ] || [ -e "$TF_CKPT.index" ] || {
  echo "TF_CKPT $TF_CKPT not found" >&2; exit 1; }

# 1. Convert DTU to the session/cluster format (scan9 = index 9; the
#    converter writes every scan it finds — restrict via start_scan if the
#    archive was trimmed to scan9).
if [ ! -d "$WORK/mvs/scan9" ] && [ ! -d "$WORK/mvs/s009" ]; then
  python tools/convert_dtu.py "$DTU_DIR" "$WORK/mvs"
fi
SCAN_DIR=$(ls -d "$WORK"/mvs/*9 "$WORK"/mvs/scan9 2>/dev/null | head -1)
[ -n "$SCAN_DIR" ] || { echo "no scan9 in $WORK/mvs" >&2; exit 1; }

# 2. Import the reference checkpoint into an orbax model dir.
if [ ! -d "$WORK/model" ]; then
  python - "$TF_CKPT" "$WORK/model" <<'EOF'
import sys
from mvsnet_tpu import tf_import
tf_import.import_checkpoint(sys.argv[1], sys.argv[2])
print("imported ->", sys.argv[2])
EOF
fi

# 3. Benchmark against GT depths at the reference test operating point
#    (reference/mvsnet/test.py:89-157; README.md:124-125).
python -m mvsnet_tpu.test \
  --input_dir "$SCAN_DIR" \
  --model_dir "$WORK/model" \
  --output_dir "$WORK/results" \
  --view_num 5 --max_d 192 --width 1152 --height 864 \
  --interval_scale 1.06

echo "results CSV in $WORK/results — compare loss/<1px/<3px vs the"
echo "reference repo's own run of test.py on the same scan (<=1% delta)."
