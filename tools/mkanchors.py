#!/usr/bin/env python3
"""Extract the per-query bench anchors from BASELINE.md into anchors.json.

Only rows inside tables whose header carries a "median s" column are
anchor rows (other tables in the file hold 16x-replication ratios etc.).
The query cell may carry an annotation ("q_dsir (r12 ... rewrite)") — the
anchor key is the first token. When a query is re-anchored in a later
table, the LATEST occurrence in file order wins, matching the prose's
"re-anchored this round" convention.

Usage: python3 tools/mkanchors.py [BASELINE.md] [tools/anchors.json]
"""
import json
import re
import sys

src = sys.argv[1] if len(sys.argv) > 1 else "BASELINE.md"
dst = sys.argv[2] if len(sys.argv) > 2 else "tools/anchors.json"

anchors = {}
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
            anchors[name] = med
    else:
        in_anchor_table = False

with open(dst, "w", encoding="utf-8") as f:
    json.dump(dict(sorted(anchors.items())), f, indent=1)
    f.write("\n")
print(f"{len(anchors)} anchors -> {dst}")
