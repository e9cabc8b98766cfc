#!/usr/bin/env python3
"""Trend + attribution report over profiling/history.jsonl.

Reference: scripts/analyze_profile.py + profile_report.html.j2 — the
reference postprocesses pprof captures into per-component attribution and
tracks run-over-run trends in a committed history file. This tool does the
same over our lightweight entries: `bench` lines (from bench.py) and
`pipeline` lines (from `lancet2-tpu pipeline --append-history`).

Output: per-kind latest-vs-previous deltas, bench metric trend, and the
stage attribution of the most recent pipeline runs.

Usage: analyze_profile.py [profiling/history.jsonl] [--last N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def load(path: str) -> list[dict]:
    entries = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if line:
                entries.append(json.loads(line))
    return entries


def fmt_delta(new: float, old: float) -> str:
    if old == 0:
        return "n/a"
    pct = 100.0 * (new - old) / abs(old)
    return f"{pct:+.1f}%"


def report_bench(entries: list[dict], last: int) -> dict:
    out = {"runs": len(entries)}
    if not entries:
        return out
    latest = entries[-1]
    out["latest"] = {
        "metric": latest.get("metric"),
        "value": latest.get("value"),
        "unit": latest.get("unit"),
        "vs_baseline": latest.get("vs_baseline"),
    }
    extra = latest.get("extra") or {}
    out["latest"]["kernels"] = {
        k: v for k, v in extra.items() if k.endswith("_gcups")
    }
    if len(entries) >= 2:
        prev = entries[-2]
        if prev.get("metric") == latest.get("metric"):
            out["delta_vs_previous"] = fmt_delta(
                float(latest.get("value", 0)), float(prev.get("value", 0))
            )
    out["trend"] = [
        {"value": e.get("value"), "vs_baseline": e.get("vs_baseline")}
        for e in entries[-last:]
    ]
    return out


def report_pipeline(entries: list[dict], last: int) -> dict:
    out = {"runs": len(entries)}
    if not entries:
        return out
    latest = entries[-1]
    out["latest"] = {
        "executor": latest.get("executor"),
        "backend": latest.get("backend"),
        "device": latest.get("device"),
        "windows": latest.get("windows"),
        "windows_per_s": round(float(latest.get("windows_per_s", 0)), 3),
        "peak_rss_mb": latest.get("peak_rss_mb"),
    }
    profile = latest.get("stage_profile") or {}
    out["latest"]["stage_attribution"] = {
        name: f"{spec['pct']}% ({spec['seconds']}s / {spec['count']}x)"
        for name, spec in profile.items()
    }
    # compare against the most recent prior run with the same configuration
    cfg = (latest.get("executor"), latest.get("backend"), latest.get("device"))
    for prev in reversed(entries[:-1]):
        if (prev.get("executor"), prev.get("backend"), prev.get("device")) == cfg:
            out["delta_vs_previous_same_config"] = {
                "windows_per_s": fmt_delta(
                    float(latest.get("windows_per_s", 0)),
                    float(prev.get("windows_per_s", 0)),
                ),
                "peak_rss_mb": fmt_delta(
                    float(latest.get("peak_rss_mb", 0)),
                    float(prev.get("peak_rss_mb", 0)),
                ),
            }
            break
    out["recent"] = [
        {
            "executor": e.get("executor"),
            "backend": e.get("backend"),
            "device": e.get("device"),
            "windows_per_s": round(float(e.get("windows_per_s", 0)), 3),
        }
        for e in entries[-last:]
    ]
    return out


def main() -> int:
    default_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "profiling", "history.jsonl",
    )
    ap = argparse.ArgumentParser()
    ap.add_argument("history", nargs="?", default=default_path)
    ap.add_argument("--last", type=int, default=5, help="trend window size")
    args = ap.parse_args()

    if not os.path.exists(args.history):
        print(f"error: no history file at {args.history}", file=sys.stderr)
        return 1
    entries = load(args.history)
    by_kind: dict[str, list[dict]] = {}
    for e in entries:
        by_kind.setdefault(e.get("kind", "unknown"), []).append(e)

    try:
        print(json.dumps({
            "history": args.history,
            "entries": len(entries),
            "bench": report_bench(by_kind.get("bench", []), args.last),
            "pipeline": report_pipeline(by_kind.get("pipeline", []), args.last),
        }, indent=2))
    except BrokenPipeError:
        pass  # output piped into head/less that closed early
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
