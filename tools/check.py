#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir> [artifact.json]

Reads <out>/oracle_sql.json, runs each SQL in DuckDB against views over the
sf parquet tables, and compares against the Spark-written parquet in
<out>/<name>/. Reports schema (column names sorted), row count, and value
equality (exact for ints/strings, bit-exact-first then 1e-9-relative for
floats). Ordered match is required — matching the driver's hash gate; the
fully-sorted retry is DIAGNOSTIC ONLY (it annotates ordering-only diffs in
the failure message, it does not turn them into passes).

With a third argument, additionally writes a per-query JSON artifact in
the driver's CORRECTNESS_r{N}.json schema (rows_match / schema_match /
hash_match / spark_rows / oracle_rows / err) — the engine-side twin of the
driver's round artifact. Round 14 shipped with an EMPTY driver artifact
(`{}`; see VERDICT r14 finding 1), so the repo carries its own signal:
`CORRECTNESS_LOCAL.json` at HEAD, pinned to the live registry by
`CorrectnessLocalSpec`. `hash_match` here means bit-exact ordered value
equality — a tolerance-only float match reports hash_match=False, exactly
as the driver's value hash would.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    return df


def values_equal(a, b):
    """Returns (equal, bitexact) — a tolerance-only float match still passes
    here but would FAIL the driver's hash gate, so callers surface it."""
    if a is None and b is None:
        return True, True
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False, False
        if math.isnan(fa) and math.isnan(fb):
            return True, True
        if fa == fb:
            return True, True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb)), False
    return a == b, True


def frames_equal(sdf: pd.DataFrame, odf: pd.DataFrame):
    """Returns (ok, n_tolerance_only_cells, message)."""
    if list(sdf.columns) != list(odf.columns):
        return False, 0, f"columns differ: spark={list(sdf.columns)} oracle={list(odf.columns)}"
    if len(sdf) != len(odf):
        return False, 0, f"row count differs: spark={len(sdf)} oracle={len(odf)}"
    sv, ov = sdf.values.tolist(), odf.values.tolist()
    n_bad = n_tol = 0
    first = None
    for i, (r1, r2) in enumerate(zip(sv, ov)):
        for j, (x, y) in enumerate(zip(r1, r2)):
            eq, bitexact = values_equal(x, y)
            if not eq:
                n_bad += 1
                if first is None:
                    first = (i, sdf.columns[j], x, y)
            elif not bitexact:
                n_tol += 1
    if n_bad:
        return False, n_tol, f"{n_bad} cell mismatches; first at row {first[0]} col {first[1]!r}: spark={first[2]!r} oracle={first[3]!r}"
    return True, n_tol, "ok"


def main(out_dir: str, sf_dir: str, artifact: str = None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    report = {}
    for name, sql in sorted(oracle.items()):
        rec = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": None, "oracle_rows": None,
               "err": None}
        report[name] = rec
        try:
            odf = canon(con.sql(sql).df())
            rec["oracle_rows"] = len(odf)
        except Exception as e:
            rec["err"] = f"oracle SQL error: {e}"
            print(f"FAIL {name}: {rec['err']}")
            n_fail += 1
            continue
        try:
            sdf = canon(pd.read_parquet(f"{out_dir}/{name}"))
            rec["spark_rows"] = len(sdf)
        except Exception as e:
            rec["err"] = f"spark output missing/unreadable: {e}"
            print(f"FAIL {name}: {rec['err']}")
            n_fail += 1
            continue
        rec["schema_match"] = list(sdf.columns) == list(odf.columns)
        rec["rows_match"] = len(sdf) == len(odf)
        ok, n_tol, msg = frames_equal(sdf, odf)
        # the driver hashes values — a tolerance-only float match fails it
        rec["hash_match"] = bool(ok and n_tol == 0)
        if not ok:
            # retry fully sorted, in case row order is the only difference
            try:
                s2 = sdf.sort_values(by=list(sdf.columns)).reset_index(drop=True)
                o2 = odf.sort_values(by=list(odf.columns)).reset_index(drop=True)
                ok2, _, _ = frames_equal(s2, o2)
            except Exception:
                ok2 = False
            if ok2:
                msg += " [MATCHES after row sort — ordering-only diff]"
        if ok:
            tol = f"  [WARN {n_tol} float cells match by tolerance only — driver hash would FAIL]" if n_tol else ""
            print(f"PASS {name} ({len(sdf)} rows){tol}")
            n_pass += 1
        else:
            rec["err"] = msg
            print(f"FAIL {name}: {msg}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed, "
          f"{len(oracle)} with oracle")
    if artifact:
        with open(artifact, "w") as f:
            json.dump(report, f, indent=2, sort_keys=True)
            f.write("\n")
        print(f"wrote {artifact}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
