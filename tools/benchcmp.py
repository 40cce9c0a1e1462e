#!/usr/bin/env python3
"""Compare engine bench times against DuckDB running the same oracle SQL.

Usage: python3 tools/benchcmp.py <verify_out_dir> <sf_dir> [BENCH_LOCAL.json]

DuckDB executing the oracle SQL over the same parquet is the closest local
stand-in for "the reference's single-node throughput" (BASELINE.md: the
reference publishes no numbers). Prints spark_sec, duck_sec (min of 3),
and the ratio for every oracled query, worst ratios first.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    bench_path = sys.argv[3] if len(sys.argv) > 3 else "BENCH_LOCAL.json"
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    with open(bench_path) as f:
        bench = json.load(f)["queries"]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    rows = []
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
            print(f"{name}: DuckDB error {e}")
            continue
        spark = bench.get(name)
        if spark is None:
            continue
        rows.append((spark / best if best > 0 else float("inf"),
                     name, spark, best))

    if not rows:
        print("nothing to compare (no query appears in both inputs)")
        return
    rows.sort(reverse=True)
    print(f"{'query':34} {'spark_s':>8} {'duck_s':>8} {'ratio':>7}")
    for ratio, name, spark, duck in rows:
        print(f"{name:34} {spark:8.3f} {duck:8.3f} {ratio:7.2f}")
    total_s = sum(r[2] for r in rows)
    total_d = sum(r[3] for r in rows)
    ratio = total_s / total_d if total_d > 0 else float("inf")
    print(f"{'TOTAL':34} {total_s:8.3f} {total_d:8.3f} {ratio:7.2f}")


if __name__ == "__main__":
    main()
