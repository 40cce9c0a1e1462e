#!/usr/bin/env python3
"""Regenerate README.md's counter block from artifacts — never hand-type
the numbers (they drifted in rounds 5 AND 6).

Sources:
  - query counts: BENCH_LOCAL.json's n_registered / n_oracled (written by
    graft.Bench from SparkEntry itself, independent of any ONLY filter)
  - test counts: static test(/property( registrations under src/test
    (equals the report-XML total; gated by ReadmeCountersSpec)
  - bench headline: BENCH_LOCAL.json total / steal_pct / query count

Usage: python3 tools/update_readme.py [--check]
  --check: exit 1 if README's block differs from what would be generated
           (regenerates nothing). ReadmeCountersSpec additionally pins the
           query counts against SparkEntry inside `sbt test`, so a stale
           README fails the build even if this script never runs.
"""
import glob
import json
import os
import re
import sys

BEGIN = "<!-- AUTOGEN-COUNTERS (tools/update_readme.py) -->"
END = "<!-- /AUTOGEN-COUNTERS -->"
CMP_BEGIN = "<!-- AUTOGEN-BENCHCMP (tools/update_readme.py) -->"
CMP_END = "<!-- /AUTOGEN-BENCHCMP -->"


def block(root: str) -> str:
    bench = json.load(open(f"{root}/BENCH_LOCAL.json"))
    # Source-derived test counts — the same algorithm ReadmeCountersSpec
    # gates with (every suite registers cases statically via test(/property(;
    # the static count equals the report-XML total exactly). Deriving from
    # source instead of target/test-reports keeps README regen correct even
    # when the last `sbt test` predates newly added specs.
    n_tests = n_suites = 0
    for f in glob.glob(f"{root}/src/test/**/*.scala", recursive=True):
        src = open(f, encoding="utf-8").read()
        n_tests += len(re.findall(r"^\s*(?:test|property)\(", src, re.M))
        if re.search(r"extends (?:AnyFunSuite|AnyFlatSpec|Properties)", src):
            n_suites += 1
    # Cross-check against the last sbt test-report XML when present: the
    # static count assumes every suite registers cases statically — a
    # dynamically registered test() (inside a loop) or an ignore()d test
    # would silently drift BOTH numbers from what sbt actually runs, and
    # the report total is the ground truth for that. Warning only: the
    # XML may legitimately predate newly added specs.
    xml_total = 0
    for f in glob.glob(f"{root}/target/test-reports/*.xml"):
        m = re.search(r'tests="(\d+)"', open(f, encoding="utf-8").read())
        if m:
            xml_total += int(m.group(1))
    if xml_total and xml_total != n_tests:
        print(f"WARNING: src/test registers {n_tests} cases but the last "
              f"test-report XML totals {xml_total} — dynamic/ignored tests? "
              "(re-run `sbt test` if specs were just added)", file=sys.stderr)
    # Bench writes steal_pct: null when /proc/stat is unreadable or the
    # deltas are degenerate — .get's default only covers a MISSING key, so
    # a null must be mapped to 'n/a' explicitly or the line reads 'None %'.
    steal = bench.get("steal_pct")
    steal_str = "n/a" if steal is None else str(steal)
    lines = [
        BEGIN,
        f"- {bench['n_registered']} registered queries, "
        f"{bench['n_oracled']} with DuckDB oracles (sf0.01 hash gate)",
        f"- {n_tests} ScalaTest cases across {n_suites} suites "
        f"(last `sbt test` report)",
        f"- bench headline: {len(bench['queries'])} queries in "
        f"{bench['value']:.1f} s at {bench['sf'].rstrip('/').rsplit('/', 1)[-1]}, "
        f"local[32], steal {steal_str} % "
        f"(BENCH_LOCAL.json"
        + (f", per-query min across {bench['jvms']} fresh JVMs"
           if bench.get("jvms") else "") + ")",
        END,
    ]
    return "\n".join(lines)


def cmp_block(root: str) -> str:
    """Throughput-vs-DuckDB headline, generated from BENCHCMP.json so every
    ratio in README traces to a committed artifact (round-8 verdict item:
    the previous numbers came from an uncommitted one-off run)."""
    cmp_ = json.load(open(f"{root}/BENCHCMP.json"))
    t = cmp_["totals"]
    sf = cmp_["sf"].rstrip("/").rsplit("/", 1)[-1]
    duck_steal = cmp_.get("duck_steal_pct")
    bench_steal = cmp_.get("bench_steal_pct")
    return "\n".join([
        CMP_BEGIN,
        f"- vs DuckDB on the same oracle SQL at {sf}: "
        f"**{t['ratio']:.2f}× total** over {cmp_['n_compared']} oracled "
        f"queries; {t['ratio_ex_certificates']:.2f}× excluding the "
        f"{len(cmp_['excluded_certificates'])} certificate queries; "
        f"{t['ratio_ex_cert_and_cc']:.2f}× excluding certificates + the "
        f"connected-components pair (BENCHCMP.json; spark side "
        f"{cmp_['bench_artifact']} at steal "
        f"{'n/a' if bench_steal is None else bench_steal} %, duck side at "
        f"steal {'n/a' if duck_steal is None else duck_steal} %)",
        CMP_END,
    ])


def main() -> int:
    root = "."
    readme = open(f"{root}/README.md").read()
    if BEGIN not in readme or END not in readme:
        print("README.md is missing the AUTOGEN-COUNTERS markers", file=sys.stderr)
        return 1
    new = re.sub(re.escape(BEGIN) + ".*?" + re.escape(END), lambda _: block(root),
                 readme, flags=re.S)
    if CMP_BEGIN in new and CMP_END in new:
        if os.path.exists(f"{root}/BENCHCMP.json"):
            new = re.sub(re.escape(CMP_BEGIN) + ".*?" + re.escape(CMP_END),
                         lambda _: cmp_block(root), new, flags=re.S)
        elif "--check" in sys.argv:
            # A committed throughput-vs-DuckDB block with no artifact behind
            # it is exactly the staleness this script exists to catch — fail
            # with a distinct code rather than silently passing the block.
            print("BENCHCMP.json missing but README carries a committed "
                  "throughput-vs-DuckDB block — run tools/benchcmp.py",
                  file=sys.stderr)
            return 2
        else:
            print("BENCHCMP.json missing — run tools/benchcmp.py to refresh "
                  "the throughput-vs-DuckDB block; leaving it as committed",
                  file=sys.stderr)
    if "--check" in sys.argv:
        if new != readme:
            print("README counters are stale — run tools/update_readme.py",
                  file=sys.stderr)
            return 1
        print("README counters up to date")
        return 0
    if new != readme:
        open(f"{root}/README.md", "w").write(new)
        print("README counters regenerated")
    else:
        print("README counters unchanged")
    return 0


if __name__ == "__main__":
    sys.exit(main())
