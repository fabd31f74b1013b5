#!/usr/bin/env bash
# Freeze the Rust reference's outputs for cross-validation.
#
# This environment ships neither cargo nor gmsh (verified in round 3), so
# golden parity currently rests on the independent dense oracle
# (magnetite_tpu/oracle.py). In an environment that HAS the toolchains,
# this script builds the reference binary (/root/reference), runs the three
# bundled examples, and freezes their nodes.csv/elements.csv under
# tests/golden/rust/<example>/ -- after which
# tests/test_rust_reference.py stops self-skipping and asserts the rebuild
# matches the Rust binary to 1e-6 relative (BASELINE.md accuracy target).
#
# Usage: scripts/validate_reference.sh [reference_dir]
set -euo pipefail

REF=${1:-/root/reference}
REPO=$(cd "$(dirname "$0")/.." && pwd)
OUT="$REPO/tests/golden/rust"

for tool in cargo gmsh python3; do
  if ! command -v "$tool" >/dev/null 2>&1; then
    echo "SKIP: '$tool' not found -- this environment cannot run the Rust reference." >&2
    exit 2
  fi
done

echo "building reference binary (release)..."
cargo build --release --manifest-path "$REF/Cargo.toml"
BIN="$REF/target/release/magnetite"

run_example() {
  local name=$1; shift
  local dir
  dir=$(mktemp -d)
  echo "running $name..."
  # --skip suppresses the matplotlib window; CSVs land in the CWD
  (cd "$dir" && "$BIN" "$@" --skip)
  mkdir -p "$OUT/$name"
  cp "$dir/nodes.csv" "$dir/elements.csv" "$OUT/$name/"
  rm -rf "$dir"
}

EX="$REF/examples"
run_example tensile "$EX/tensile-example/input.json" "$EX/tensile-example/vertices.csv"
run_example cover "$EX/cover-eample/input.json" "$EX/cover-eample/geom.svg"
run_example linkedin "$EX/linkedin-logo/input.json" "$EX/linkedin-logo/linkedin.svg"

echo "frozen Rust outputs under $OUT"
echo "now run: python -m pytest tests/test_rust_reference.py -v"
