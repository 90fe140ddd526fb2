#!/usr/bin/env python3
"""Extract the per-query bench anchors from BASELINE.md into anchors.json.

Only rows inside tables whose header carries a "median s" column are
anchor rows (other tables in the file hold 16x-replication ratios etc.).
The query cell may carry an annotation ("q_dsir (r12 ... rewrite)") — the
anchor key is the first token. When a query is re-anchored in a later
table, the LATEST occurrence in file order wins, matching the prose's
"re-anchored this round" convention.

Anchors are FLOORED at MIN_ANCHOR_S (0.25 s): a 0.1 s measured median is
below single-run timing noise at sf0.1, so a raw ratio against it reports
scheduler wobble as the sweep's "worst ratio" (q_pr_curve's 0.13 s anchor
headlined two rounds at 1.27-1.55x on noise alone) and buries real
regressions on substantive rows. The floor makes a sub-floor row's ratio
read "within noise of instant" instead; rows at or above the floor are
untouched. Bench's absolute +0.5 s adjudication band already protects
these rows from false WEAK grades — the floor aligns the REPORTED ratios
with that same judgment.

The RAW (unfloored) medians land beside the floored anchors in
<dst>_raw.json (tools/anchors_raw.json): a sub-floor query that genuinely
regresses several-fold (0.10 s -> 0.40 s) is invisible to the floored
ratio gate until it crosses ~0.44 s absolute — Bench reads the raw file
to TAG such rows informationally ("subnoise" in the artifact) without
changing any gate.

Usage: python3 tools/mkanchors.py [BASELINE.md] [tools/anchors.json]
"""
import json
import re
import sys

MIN_ANCHOR_S = 0.25

src = sys.argv[1] if len(sys.argv) > 1 else "BASELINE.md"
dst = sys.argv[2] if len(sys.argv) > 2 else "tools/anchors.json"

anchors = {}
raw = {}
in_anchor_table = False
for line in open(src, encoding="utf-8"):
    line = line.rstrip()
    if line.startswith("|"):
        cells = [c.strip() for c in line.strip("|").split("|")]
        if len(cells) >= 3 and cells[0].lower() == "query":
            in_anchor_table = any("median s" in c.lower() for c in cells)
            continue
        if re.match(r"^[-: ]+$", cells[0] or "-"):
            continue
        if in_anchor_table and cells and cells[0].startswith("q"):
            name = cells[0].split()[0]
            try:
                med = float(cells[2])
            except (ValueError, IndexError):
                continue
            anchors[name] = max(med, MIN_ANCHOR_S)
            raw[name] = med
    else:
        in_anchor_table = False

with open(dst, "w", encoding="utf-8") as f:
    json.dump(dict(sorted(anchors.items())), f, indent=1)
    f.write("\n")
raw_dst = dst[:-5] + "_raw.json" if dst.endswith(".json") else dst + "_raw"
with open(raw_dst, "w", encoding="utf-8") as f:
    json.dump(dict(sorted(raw.items())), f, indent=1)
    f.write("\n")
print(f"{len(anchors)} anchors -> {dst} (+ raw medians -> {raw_dst})")
