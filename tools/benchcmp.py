#!/usr/bin/env python3
"""Compare engine bench times against DuckDB running the same oracle SQL,
and write the committed BENCHCMP.json artifact README's throughput claims
trace to.

Usage: python3 tools/benchcmp.py <verify_out_dir> <sf_dir> [BENCH_LOCAL.json]

DuckDB executing the oracle SQL over the same parquet is the closest local
stand-in for "the reference's single-node throughput" (BASELINE.md: the
reference publishes no numbers). The Spark side comes from the bench
artifact (min-of-2/3, per-query isolation); the DuckDB side is min of 3
in-process runs here. Two cuts are reported alongside the raw total:

- ex_certificates: drops the five KKT-certificate queries, where DuckDB
  reads a pinned ~1 ms verdict VALUES table while Spark performs the
  actual path fits being certified — not equivalent work in either
  direction.
- ex_cert_and_cc: additionally drops the two connected-components
  queries, where DuckDB pays tens of seconds for unrolled
  label-propagation joins against Spark's gated union-find — equivalent
  results, structurally different work; the residual ratio is then
  dominated by Spark's fixed per-query session floor.

Writes BENCHCMP.json (steal sampled around the DuckDB leg; the Spark
leg's steal rides in from the bench artifact) and prints the table.
"""
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Non-equivalent-work cuts (see module docstring). Kept in the artifact so
# the README numbers are reproducible from it without re-deriving the sets.
# m_intercept_mle_families meets the same criterion as the KKT queries:
# DuckDB evaluates closed-form MLE expressions over integer class counts
# (~ms) while Spark runs four saturating-sigma fits to certify its solver
# lands on those MLEs — Spark performs the fits, DuckDB reads arithmetic.
CERT_QUERIES = ["m_slope_path_kkt_gaussian", "m_slope_path_kkt_binomial",
                "m_slope_path_kkt_multinomial", "m_slope_path_kkt_poisson",
                "t1_train_cv_kkt", "m_intercept_mle_families"]
CC_QUERIES = ["p_dup_clusters", "p_dup_keep_best"]


def cpu_stat():
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
        vals = [int(x) for x in parts]
        return sum(vals), vals[7] if len(vals) > 7 else 0
    except OSError:
        return None


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    bench_path = sys.argv[3] if len(sys.argv) > 3 else "BENCH_LOCAL.json"
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    with open(bench_path) as f:
        bench_full = json.load(f)
    bench = bench_full["queries"]

    stat0 = cpu_stat()
    t_start = time.time()
    con = duckdb.connect()
    # cap + spill: without these DuckDB grows unbounded and an oracle that
    # crosses physical RAM dies with an OOM error instead of spilling (the
    # r14 p_full_pipeline hole). The cap matches DuckDB's own default on
    # this 128 GiB box (80% of RAM) so no query slows down relative to an
    # uncapped run — a 48 GiB trial run pushed the two CC oracles into
    # disk-spill territory (32 s -> ~575 s each), distorting the headline
    # ratio in Spark's favor; the spill dir is the safety net that turns
    # any future RAM-crossing oracle into a slow row instead of a hole.
    tmp = "/tmp/duckdb_benchcmp_spill"
    # derive the cap from detected RAM (DuckDB's own default policy, 80%)
    # rather than hard-coding this box's 100 GB: on a smaller machine a
    # hard-coded cap above physical RAM never triggers spilling — the
    # exact OOM hole the setting exists to close.
    try:
        mem_gb = max(
            1, int(0.8 * os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
                   / 2**30))
    except (ValueError, OSError, AttributeError):
        mem_gb = 100  # sysconf unavailable: fall back to the dev-box cap
    con.execute(f"SET memory_limit='{mem_gb}GB'")
    con.execute(f"SET temp_directory='{tmp}'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    rows = []
    errors = {}
    for name, sql in sorted(oracles.items()):
        if not sql:
            continue
        best = float("inf")
        try:
            for _ in range(3):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                best = min(best, time.perf_counter() - t0)
        except Exception as e:  # noqa: BLE001
            errors[name] = str(e)
            print(f"{name}: DuckDB error {e}")
            continue
        spark = bench.get(name)
        if spark is None or spark < 0:
            continue
        rows.append((spark / best if best > 0 else float("inf"),
                     name, spark, best))

    if not rows:
        print("nothing to compare (no query appears in both inputs)")
        return 1
    rows.sort(reverse=True)
    print(f"{'query':34} {'spark_s':>8} {'duck_s':>8} {'ratio':>7}")
    for ratio, name, spark, duck in rows:
        print(f"{name:34} {spark:8.3f} {duck:8.3f} {ratio:7.2f}")

    def cut(excl):
        sel = [r for r in rows if r[1] not in excl]
        s = sum(r[2] for r in sel)
        d = sum(r[3] for r in sel)
        return s, d, (s / d if d > 0 else float("inf"))

    total = cut(set())
    ex_cert = cut(set(CERT_QUERIES))
    ex_both = cut(set(CERT_QUERIES) | set(CC_QUERIES))
    print(f"{'TOTAL':34} {total[0]:8.3f} {total[1]:8.3f} {total[2]:7.2f}")
    print(f"{'ex-certificates':34} {ex_cert[0]:8.3f} {ex_cert[1]:8.3f} "
          f"{ex_cert[2]:7.2f}")
    print(f"{'ex-certificates-and-cc':34} {ex_both[0]:8.3f} {ex_both[1]:8.3f} "
          f"{ex_both[2]:7.2f}")

    stat1 = cpu_stat()
    steal = None
    if stat0 and stat1 and stat1[0] > stat0[0]:
        steal = round(100.0 * (stat1[1] - stat0[1]) / (stat1[0] - stat0[0]), 2)
    artifact = {
        "metric": "benchcmp",
        "sf": sf_dir,
        "bench_artifact": bench_path,
        "bench_sf": bench_full.get("sf"),
        "bench_steal_pct": bench_full.get("steal_pct"),
        "duck_steal_pct": steal,
        "duck_runs_per_query": 3,
        "duck_agg": "min",
        "n_compared": len(rows),
        "queries": {name: {"spark_sec": round(spark, 4),
                           "duck_sec": round(duck, 4),
                           "ratio": round(ratio, 3)}
                    for ratio, name, spark, duck in sorted(rows, key=lambda r: r[1])},
        "totals": {
            "spark_sec": round(total[0], 3), "duck_sec": round(total[1], 3),
            "ratio": round(total[2], 3),
            "ratio_ex_certificates": round(ex_cert[2], 3),
            "ratio_ex_cert_and_cc": round(ex_both[2], 3)},
        "excluded_certificates": CERT_QUERIES,
        "excluded_cc": CC_QUERIES,
        "duck_errors": errors,
        "wall_sec": round(time.time() - t_start, 1),
    }
    with open("BENCHCMP.json", "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    print("wrote BENCHCMP.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
