#!/usr/bin/env python3
"""Bottom-up lost_at_stage attribution over probe forensics TSVs.

Reference: scripts/analyze_probe_results.py + docs_dev/subsystems/
probe_tracking.md — for each probed truth variant, find its best window
attempt (deepest pipeline stage with surviving signal) and attribute where
the signal died: a variant that was genotyped is "called"; one whose k-mers
never entered any graph is "lost_at_build"; in between, the cascade names
the pruning/anchor/cycle/complexity/traversal/extraction/genotyper stage.

Usage: analyze_probe_results.py <probe_results.tsv>
"""

from __future__ import annotations

import collections
import json
import sys

STAGE_ORDER = [
    "build", "lowcov1", "compress1", "lowcov2", "compress2", "tips",
    "path", "extracted", "genotyped",
]
EVENTS = ["no_anchor", "short_anchor", "cycle", "complex", "traversal_limit"]


def attribute(rows: list[dict]) -> str:
    """lost_at_stage for one probe across all its window attempts."""
    best_depth = -1
    best_row = None
    for row in rows:
        depth = -1
        for i, stage in enumerate(STAGE_ORDER):
            if row.get(stage) == "1":
                depth = i
        if depth > best_depth:
            best_depth = depth
            best_row = row
    if best_depth == len(STAGE_ORDER) - 1:
        return "called"
    if best_row is None or best_depth < 0:
        return "lost_at_build"
    # event-based reasons take precedence when the best attempt hit one
    for event in EVENTS:
        if best_row.get(event) == "1":
            return f"lost_to_{event}"
    return f"lost_at_{STAGE_ORDER[best_depth + 1]}"


def main(path: str) -> int:
    with open(path) as fh:
        lines = fh.read().splitlines()
    header = lines[0].split("\t")
    by_probe: dict[str, list[dict]] = collections.defaultdict(list)
    for line in lines[1:]:
        row = dict(zip(header, line.split("\t")))
        by_probe[row["probe"]].append(row)

    summary = collections.Counter()
    per_probe = {}
    for probe, rows in sorted(by_probe.items()):
        stage = attribute(rows)
        per_probe[probe] = stage
        summary[stage] += 1

    print(json.dumps({"summary": dict(summary), "per_probe": per_probe}, indent=2))
    return 0


if __name__ == "__main__":
    if len(sys.argv) != 2:
        print(__doc__)
        raise SystemExit(2)
    raise SystemExit(main(sys.argv[1]))
