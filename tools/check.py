#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each SQL
in DuckDB with every testdata parquet registered as a view, and compares
against the Spark parquet dump <verifyOutDir>/<name>/ — columns sorted by
name, rows sorted, values stringified. Dev-only tool; the engine itself never
depends on Python.
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def canon(rows, cols):
    # Mimic the driver: sort the frame via pandas sort_values over all
    # columns (name-sorted). pandas cannot hash ndarray/list cells there
    # ("unhashable type: numpy.ndarray", r03 array_funcs/quantiles_cont)
    # — so ARRAY-typed output columns must crash HERE too, not pass
    # silently through a tuple-sort.
    import pandas as pd
    df = pd.DataFrame(rows, columns=cols)
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns))
    return [tuple(norm(v) for v in r)
            for r in df.itertuples(index=False, name=None)]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        # a table may be a bare parquet file (driver testdata) or a
        # DIRECTORY of part files (Spark/appended corpora) — glob the dir
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            # Go through pandas on BOTH sides, like the driver does: DuckDB
            # HUGEINT/DECIMAL become float64 while Spark parquet int64/Decimal
            # stay exact — a fetchall()-based compare hides that divergence.
            odf = con.execute(sql).df()
            oracle_cols = list(odf.columns)
            oracle_rows = list(odf.itertuples(index=False, name=None))
            import pandas as pd
            sdf = pd.read_parquet(f"{out_dir}/{name}")
            spark_cols = list(sdf.columns)
            spark_rows = list(sdf.itertuples(index=False, name=None))
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if sorted(oracle_cols) != sorted(spark_cols):
            print(f"FAIL {name}: cols oracle={sorted(oracle_cols)} "
                  f"spark={sorted(spark_cols)}")
            n_fail += 1
            continue
        a = canon(oracle_rows, oracle_cols)
        b = canon(spark_rows, spark_cols)
        if a != b:
            diff = next((i for i, (x, y) in enumerate(zip(a, b)) if x != y),
                        min(len(a), len(b)))
            print(f"FAIL {name}: rows oracle={len(a)} spark={len(b)}; "
                  f"first diff @{diff}:")
            print(f"  oracle: {a[diff] if diff < len(a) else '<none>'}")
            print(f"  spark : {b[diff] if diff < len(b) else '<none>'}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
