#!/bin/bash
# Parity-mode oracle sweep: replay the relational-core §2 rows under the
# language's alternate global modes and diffcheck each against DuckDB.
#   - decimal:   spark.graft.decimalNumbers=true  (exact-decimal numbers)
#   - collation: spark.graft.collation=UNICODE    (ICU text ordering)
# Usage: tools/paritycheck.sh [sfDir]   (default /root/testdata/sf0.001)
set -e
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.001}"
for MODE in decimal collation; do
  OUT="/tmp/verify_parity_$MODE"
  echo "== parity mode: $MODE (sf=$SF) =="
  LOG=$(sbt -batch "runMain graft.Verify $SF $OUT --subset=core --mode=$MODE" 2>&1) \
    || { echo "$LOG" | tail -20; echo "parity $MODE: sbt run FAILED"; exit 1; }
  if echo "$LOG" | grep -E "\[verify\].*failed"; then
    echo "parity $MODE: query failures above"; exit 1
  fi
  SUMMARY=$(python3 tools/diffcheck.py "$SF" "$OUT" | grep -E "PASS|FAIL" | head -1)
  echo "$SUMMARY"
  echo "$SUMMARY" | grep -q "FAIL 0" \
    || { echo "parity $MODE: diffcheck FAILED"; exit 1; }
done
