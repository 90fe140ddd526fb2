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
  sbt -batch "runMain graft.Verify $SF $OUT --subset=core --mode=$MODE" \
    2>&1 | grep -E "\[verify\].*failed" && exit 1
  python3 tools/diffcheck.py "$SF" "$OUT" | grep -E "PASS|FAIL" | head -1
done
