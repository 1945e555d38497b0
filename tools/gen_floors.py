#!/usr/bin/env python3
"""Regenerate BENCH_FLOORS.json — the committed per-query floors behind
Bench.scala's cross-run drift gate (round-16 instrument).

Floor = per-query MEDIAN of min-of-reps across every clean
(contaminated=false) sf0.1 BENCH_LOCAL.json revision in git history with
a round-12+ catalog (>=144 queries; earlier revisions predate the
failed-rep Either guard and carry ~0.04s artifacts for broken queries).
Median, not global min: one lucky run would set an unrepeatable floor
and spam the drifted list; one poisoned run would set a bogus low.

Only queries present in the CURRENT catalog (the newest revision's
queries map, plus the working tree's BENCH_LOCAL.json if newer) get
floors; renamed/retired queries drop out automatically.

Usage: python3 tools/gen_floors.py   (from the repo root; rewrites
BENCH_FLOORS.json in place — commit the result)
"""
import json
import statistics
import subprocess


def revisions():
    out = subprocess.run(
        ["git", "log", "--format=%H", "--follow", "--", "BENCH_LOCAL.json"],
        capture_output=True, text=True).stdout.split()
    return out


def load(rev):
    try:
        txt = subprocess.run(["git", "show", f"{rev}:BENCH_LOCAL.json"],
                             capture_output=True, text=True).stdout
        return json.loads(txt)
    except Exception:
        return None


def main():
    revs = revisions()
    current = set()
    samples = {}
    used = 0
    for r in revs:
        d = load(r)
        if not d:
            continue
        if d.get("contaminated") is True:
            continue
        if "sf0.1" not in str(d.get("sf", "")):
            continue
        qs = d.get("queries", {})
        if len(qs) < 144:   # pre-round-12: broken-rep artifacts
            continue
        if not current:     # newest clean revision defines the catalog
            current = set(qs)
        used += 1
        for k, v in qs.items():
            if isinstance(v, (int, float)) and v > 0:
                samples.setdefault(k, []).append(v)
    # include the working tree's file (the round's own close run) so new
    # queries get a floor the round AFTER they land — but NOT when it is
    # byte-identical to the newest committed revision (the normal clean-
    # checkout state), which would double-count the latest run in every
    # median and drag floors toward it
    try:
        wt_txt = open("BENCH_LOCAL.json").read()
        head_txt = subprocess.run(
            ["git", "show", "HEAD:BENCH_LOCAL.json"],
            capture_output=True, text=True).stdout
        wt = json.loads(wt_txt) if wt_txt != head_txt else {}
        if wt.get("contaminated") is False and "sf0.1" in str(wt.get("sf", "")):
            current |= set(wt.get("queries", {}))
            for k, v in wt.get("queries", {}).items():
                if isinstance(v, (int, float)) and v > 0:
                    samples.setdefault(k, []).append(v)
            used += 1
    except Exception:
        pass
    floors = {k: round(statistics.median(v), 4)
              for k, v in samples.items() if k in current}
    out = {
        "_meta": {
            "source": f"per-query MEDIAN of min-of-reps across {used} clean "
                      "(contaminated=false) sf0.1 BENCH_LOCAL.json revisions "
                      "(round 12+), filtered to the current catalog",
            "stat": "median over per-run min_of_reps seconds at sf0.1, local[32]",
            "drift_ratio": 3.0,
            "generator": "tools/gen_floors.py",
            "note": "Median, not global min: a single lucky run would set a "
                    "floor the query can never repeat and spam the drifted "
                    "list; a single contaminated or broken run (the r11 "
                    "0.04s events artifacts) would poison a min. Bench.scala "
                    "drift gate: a query whose fresh min exceeds drift_ratio "
                    "x floor gets one fresh-JVM rep set; unresolved excess "
                    "lands in the 'drifted' list of the bench envelope.",
        },
        "floors": dict(sorted(floors.items())),
    }
    json.dump(out, open("BENCH_FLOORS.json", "w"), indent=1)
    print(f"revisions used: {used}, floors written: {len(floors)}")


if __name__ == "__main__":
    main()
