#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/parity_check.py <sfDir> <verifyOutDir>

Reads oracle_sql.json from the verify output dir, runs each oracle in
DuckDB against the parquet tables in sfDir, loads the corresponding
Spark parquet dump, and compares: column names (sorted), row count, and
cell values (exact for ints/strings, bit-exact for floats with a
reported max-abs-diff on mismatch). Exit code 1 if any query diverges.

Driver-side tooling only (duckdb/pyarrow/pandas are not dependencies of
the Scala library).
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def cells_equal(a, b) -> tuple[bool, float]:
    if a is None and b is None:
        return True, 0.0
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True, 0.0
        return a == b, abs(a - b) if not (math.isnan(a) or math.isnan(b)) else float("inf")
    try:
        if pd.isna(a) and pd.isna(b):
            return True, 0.0
        if pd.isna(a) or pd.isna(b):
            return False, float("inf")
    except (TypeError, ValueError):
        pass
    return a == b, float("inf") if a != b else 0.0


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems = []
    s_cols, d_cols = sorted(spark_df.columns), sorted(duck_df.columns)
    if s_cols != d_cols:
        return [f"schema mismatch: spark={s_cols} duck={d_cols}"]
    # the driver's hash is TYPE-sensitive: a DuckDB HUGEINT (a bare
    # SUM(<integer>) in the oracle's outer SELECT) lands in pandas as
    # float64 while Spark emits int64 — values compare equal here but
    # the driver hash-fails (8 queries in round 7). Flag any dtype-KIND
    # divergence so the oracle-typing bug can't slip through this
    # mirror again; the fix is CAST(SUM(...) AS BIGINT) in the oracle.
    for col in s_cols:
        sk, dk = spark_df[col].dtype.kind, duck_df[col].dtype.kind
        if sk != dk and not (len(spark_df) == 0 and {sk, dk} <= {"O", "f", "i"}):
            problems.append(
                f"type mismatch on {col}: spark={spark_df[col].dtype} "
                f"duck={duck_df[col].dtype} (un-cast integer aggregate "
                f"in the oracle's outer SELECT?)")
    if problems:
        return problems
    if len(spark_df) != len(duck_df):
        return [f"row count: spark={len(spark_df)} duck={len(duck_df)}"]
    s, d = norm(spark_df), norm(duck_df)
    n_bad, max_diff, first = 0, 0.0, None
    for col in s.columns:
        sv, dv = s[col].tolist(), d[col].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            eq, diff = cells_equal(a, b)
            if not eq:
                n_bad += 1
                if diff != float("inf"):
                    max_diff = max(max_diff, diff)
                if first is None:
                    first = f"col={col} row={i}: spark={a!r} duck={b!r}"
    if n_bad:
        problems.append(f"{n_bad} cell mismatches (max float diff {max_diff:g}); first: {first}")
    return problems


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    # a partial dump (SPARK_GRAFT_ONLY iteration aid) only checks the
    # queries actually dumped; the full driver run dumps everything
    import os
    present = {n for n in oracle if os.path.exists(f"{out_dir}/{n}")}
    skipped = len(oracle) - len(present)
    if skipped:
        print(f"(partial dump: {skipped} queries not dumped, skipping)")
        oracle = {n: q for n, q in oracle.items() if n in present}
    for name in sorted(oracle):
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: oracle SQL error: {str(ex)[:300]}")
            failed.append(name)
            continue
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as ex:
            print(f"FAIL {name}: spark output unreadable: {str(ex)[:200]}")
            failed.append(name)
            continue
        problems = compare(name, spark_df, duck_df)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"OK   {name} ({len(spark_df)} rows)")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} queries match")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
