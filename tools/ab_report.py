#!/usr/bin/env python3
"""Summarize tools/ab.sh output: per query, min over each side's legs
(min-of-3 within a leg already), plus per-leg values for spread."""
import glob
import json
import sys

prefix = sys.argv[1]
sides = {}
for side in ("base", "new"):
    runs = []
    for f in sorted(glob.glob(f"/tmp/{prefix}_{side}_*.json")):
        runs.append(json.load(open(f))["queries"])
    sides[side] = runs
queries = sorted(sides["base"][0]) if sides["base"] else []
print(f"{'query':38} {'base':>7} {'new':>7} {'speedup':>8}  legs(base|new)")
for q in queries:
    b = min(r[q] for r in sides["base"])
    n = min(r[q] for r in sides["new"])
    lb = ",".join(f"{r[q]:.2f}" for r in sides["base"])
    ln = ",".join(f"{r[q]:.2f}" for r in sides["new"])
    print(f"{q:38} {b:7.2f} {n:7.2f} {b/n:8.2f}  {lb}|{ln}")
