#!/usr/bin/env python3
"""Per-query ×10 scaling exponents from the committed rehearsal artifact.

BENCH_SCALE.json holds TWO Bench JSON lines — the full suite on the ×1
rehearsal corpus, then on the ×10 corpus (same generator, same session
shape; see graft.tools.ScaleRehearsal). The exponent log10(t10/t1) is the
one-decade growth rate: 0 = constant, 1 = linear. Both lines carry
steal_pct/wall metadata so the reading is adjudicable.

Usage: python3 tools/scale_exponents.py [BENCH_SCALE.json] [--md]
  --md: print a markdown table (for SCALING.md); default is a summary +
        the queries above the watch threshold.
"""
import json
import math
import sys

WATCH = 0.9  # exponents at/above this are scan-bound-or-worse: call them out


def main() -> int:
    path = next((a for a in sys.argv[1:] if not a.startswith("--")),
                "BENCH_SCALE.json")
    lines = [json.loads(l) for l in open(path) if l.strip()]
    if len(lines) != 2:
        print(f"{path} must hold exactly 2 bench lines (x1, x10); "
              f"got {len(lines)}", file=sys.stderr)
        return 1
    x1, x10 = lines
    for tag, b in (("x1", x1), ("x10", x10)):
        print(f"# {tag}: total {b['value']:.1f}s, wall {b.get('wall_sec')}s, "
              f"steal {b.get('steal_pct')}%, sf {b['sf']}")
    exps = {}
    for q, t1 in x1["queries"].items():
        t10 = x10["queries"].get(q)
        if t10 is None or t1 <= 0 or t10 <= 0:
            print(f"# WARN {q}: missing or failed in one run "
                  f"(t1={t1}, t10={t10})")
            continue
        exps[q] = math.log10(t10 / t1)
    if "--md" in sys.argv:
        print("| query | x1 s | x10 s | exponent |")
        print("|---|---|---|---|")
        for q in sorted(exps, key=exps.get, reverse=True):
            print(f"| {q} | {x1['queries'][q]:.2f} | {x10['queries'][q]:.2f} "
                  f"| {exps[q]:.2f} |")
    else:
        vals = sorted(exps.values())
        print(f"# {len(exps)} queries, exponent median "
              f"{vals[len(vals) // 2]:.2f}, max {vals[-1]:.2f}")
        for q in sorted(exps, key=exps.get, reverse=True):
            if exps[q] >= WATCH:
                print(f"WATCH {q}: exp {exps[q]:.2f} "
                      f"({x1['queries'][q]:.2f}s -> {x10['queries'][q]:.2f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
