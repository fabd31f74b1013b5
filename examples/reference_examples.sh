#!/bin/sh
# Run the reference repo's three bundled examples through the CLI
# (same invocation shape as the reference binary; --skip suppresses the
# interactive plot, --save-plot writes the figure instead).
set -e
EX=/root/reference/examples
OUT=${1:-/tmp/magnetite_tpu_examples}
mkdir -p "$OUT"

python -m magnetite_tpu.cli "$EX/tensile-example/input.json" \
    "$EX/tensile-example/vertices.csv" \
    --skip --save-plot "$OUT/tensile.png" --out-dir "$OUT"

python -m magnetite_tpu.cli "$EX/cover-eample/input.json" \
    "$EX/cover-eample/geom.svg" \
    --skip --save-plot "$OUT/cover.png" --out-dir "$OUT"

python -m magnetite_tpu.cli "$EX/linkedin-logo/input.json" \
    "$EX/linkedin-logo/linkedin.svg" \
    --skip --save-plot "$OUT/linkedin.png" --out-dir "$OUT"

echo "outputs in $OUT"
