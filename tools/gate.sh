#!/usr/bin/env bash
# Snapshot gate — run on the EXACT tree you are about to leave as the
# round snapshot. Round 4 shipped a one-missing-import compile break that
# voided the whole round's recorded results (VERDICT r4 item 1); this
# script is the institutional fix. All four stages must pass:
#
#   1. sbt compile          (the driver's build)
#   2. sbt test             (full ScalaTest suite)
#   3. graft.Verify sf0.01  (result parquet + oracle dump)
#   4. tools/check.py       (local mirror of the driver's DuckDB oracle)
#
# Usage: tools/gate.sh  [sfdir]   (default /root/testdata/sf0.01)
set -euo pipefail
cd "$(dirname "$0")/.."

SF="${1:-/root/testdata/sf0.01}"
OUT="$(mktemp -d /tmp/graft-gate.XXXXXX)"
trap 'rm -rf "$OUT"' EXIT

if ! git diff --quiet || ! git diff --cached --quiet; then
  echo "gate: WARNING — uncommitted changes; the gate only certifies HEAD" >&2
fi

echo "gate: [1/4] sbt compile"
sbt -batch compile > "$OUT/compile.log" 2>&1 || {
  tail -30 "$OUT/compile.log"; echo "gate: FAIL compile"; exit 1; }

echo "gate: [2/4] sbt test"
sbt -batch test > "$OUT/test.log" 2>&1 || {
  tail -40 "$OUT/test.log"; echo "gate: FAIL test"; exit 1; }

echo "gate: [3/4] graft.Verify $SF"
sbt -batch "runMain graft.Verify $SF $OUT/verify" > "$OUT/verify.log" 2>&1 || {
  tail -30 "$OUT/verify.log"; echo "gate: FAIL verify"; exit 1; }

echo "gate: [4/4] tools/check.py"
python3 tools/check.py "$OUT/verify" "$SF" || { echo "gate: FAIL oracle"; exit 1; }

echo "gate: PASS — snapshot is certifiable"
