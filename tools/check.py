#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle correctness gate.

Runs each oracle SQL from <outDir>/oracle_sql.json against DuckDB views over
the same scale-factor parquet tables, loads the Spark result parquet written
by graft.Verify, and compares: column names (sorted), dtypes, row count, and
values (rows sorted by all columns, NaN-safe). Dev tool only — the shipped
Scala library does not depend on it.

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    import datetime
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize python date objects (Spark DATE parquet) vs pandas
    # Timestamps (DuckDB DATE) — same logical value
    for c in df.columns:
        if df[c].dtype == object and df[c].map(
                lambda v: v is None or isinstance(v, datetime.date)).all():
            df[c] = pd.to_datetime(df[c])
    # Sort by ALL columns, exactly like the driver harness. Array-valued
    # columns make pandas raise (unhashable numpy.ndarray) — deliberately
    # NOT worked around here, so the pre-flight reproduces driver failures
    # instead of masking them (r7: q_embed_quantize / q_encode_corpus
    # passed locally but errored in the driver).
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        na_position="last")
    return df.reset_index(drop=True)


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    import numpy as np
    if isinstance(a, (list, tuple, np.ndarray)) or \
            isinstance(b, (list, tuple, np.ndarray)):
        if a is None or b is None:
            return False
        la, lb = list(a), list(b)
        return len(la) == len(lb) and all(
            values_equal(x, y) for x, y in zip(la, lb))
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) or pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return a == b
        if math.isnan(af) and math.isnan(bf):
            return True
        return af == bf  # exact: the engine is designed for bit-parity
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        return list(a) == list(b)
    return a == b


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> str:
    try:
        s, d = canon(spark_df), canon(duck_df)
    except Exception as e:
        return f"FAIL harness-sort (driver would error too): {e}"
    if list(s.columns) != list(d.columns):
        return f"FAIL cols spark={list(s.columns)} duck={list(d.columns)}"
    if len(s) != len(d):
        return f"FAIL rows spark={len(s)} duck={len(d)}"
    for c in s.columns:
        sa, da = s[c].tolist(), d[c].tolist()
        for i, (x, y) in enumerate(zip(sa, da)):
            if not values_equal(x, y):
                return f"FAIL value col={c} row={i}: spark={x!r} duck={y!r}"
    # Dtype drift is a FAIL, not a note: the driver hashes canonicalized
    # value strings, and int64 `170` vs float64 `170.0` hash-differ even
    # when numerically equal (r13: q_auto_skip_evolved passed this
    # pre-flight with an "OK [dtype drift]" note and hash-failed in the
    # driver). Only unify representations the driver's own
    # canonicalization already treats as identical.
    def _canon_dtype(dt) -> str:
        t = str(dt)
        if t.startswith("datetime64"):
            return "datetime64"  # ns vs us resolution: same logical value
        if t in ("object", "string", "str"):
            return "object"      # both stringify identically
        if t.lstrip("uU").startswith("int") or t in ("Int64", "Int32"):
            return "int"         # width drift stringifies identically
        return t
    dt = [(c, str(s[c].dtype), str(d[c].dtype)) for c in s.columns
          if _canon_dtype(s[c].dtype) != _canon_dtype(d[c].dtype)]
    if dt:
        return f"FAIL dtype drift (driver hash would differ): {dt}"
    return "OK"


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_fail = 0
    import glob
    import os
    have = {os.path.basename(p) for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p)}
    for name in sorted(have):
        sql = oracle.get(name)
        try:
            spark_df = pd.concat(
                [pd.read_parquet(p) for p in sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))],
                ignore_index=True)
        except Exception as e:
            print(f"{name:28s} FAIL spark-read: {e}")
            n_fail += 1
            continue
        if sql is None:
            status = f"rows-only ({len(spark_df)} rows)"
            if len(spark_df) == 0:
                status = "FAIL rows-only result is EMPTY"
        else:
            try:
                duck_df = con.sql(sql).df()
            except Exception as e:
                print(f"{name:28s} FAIL duckdb: {e}")
                n_fail += 1
                continue
            status = compare(name, spark_df, duck_df)
        if status.startswith("FAIL"):
            n_fail += 1
        print(f"{name:28s} {status}")
    missing = set(oracle) - have
    for name in sorted(missing):
        print(f"{name:28s} FAIL spark output missing")
        n_fail += 1
    print(f"\n{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
