#!/usr/bin/env python3
"""Build a split-then-appended copy of a testdata dir for the delta-built
oracle gate (r14 verdict ask #2).

Usage: python3 tools/split_corpus.py <srcSfDir> <baseDir> <grownDir> [frac]

- every table except documents/embeddings is hardlinked verbatim into both
  output dirs;
- documents/embeddings are split by id at the `frac` quantile (default
  0.95) into a BASE part file and a DELTA part file, laid out as parquet
  DIRECTORIES (the layout crawl-drop appends land in). The grown dir
  hardlinks the base part (identical size+mtime → delta-eligible) and adds
  the delta part next to it — so staging the base dir then resolving the
  grown dir exercises `Staged.appendable`'s delta path, and the grown dir's
  content equals the source corpus row-for-row.

Dev-only tool (like check.py); the engine itself never depends on Python.
"""
import os
import sys

import duckdb

PASSTHROUGH = ["region", "nation", "customer", "supplier", "part",
               "orders", "lineitem", "events"]
SPLIT = [("documents", "doc_id"), ("embeddings", "vec_id")]


def main(src, base, grown, frac=0.95):
    import shutil
    con = duckdb.connect()
    # clean re-runs: stale outputs from a prior invocation would otherwise
    # survive the passthrough skip or crash the grown-side hardlink
    for d in (base, grown):
        if os.path.isdir(d):
            shutil.rmtree(d)
        os.makedirs(d)
    for t in PASSTHROUGH:
        s = f"{src}/{t}.parquet"
        for d in (base, grown):
            os.link(s, f"{d}/{t}.parquet")
    for t, key in SPLIT:
        s = f"{src}/{t}.parquet"
        thr = con.execute(
            f"SELECT quantile_disc({key}, {frac}) FROM '{s}'").fetchone()[0]
        bdir, gdir = f"{base}/{t}.parquet", f"{grown}/{t}.parquet"
        os.makedirs(bdir)
        os.makedirs(gdir)
        con.execute(f"COPY (SELECT * FROM '{s}' WHERE {key} <= {thr}) "
                    f"TO '{bdir}/part-base.parquet' (FORMAT PARQUET)")
        os.link(f"{bdir}/part-base.parquet", f"{gdir}/part-base.parquet")
        con.execute(f"COPY (SELECT * FROM '{s}' WHERE {key} > {thr}) "
                    f"TO '{gdir}/part-delta.parquet' (FORMAT PARQUET)")
        n_all = con.execute(f"SELECT count(*) FROM '{s}'").fetchone()[0]
        n_base = con.execute(
            f"SELECT count(*) FROM '{bdir}/part-base.parquet'").fetchone()[0]
        print(f"{t}: {n_all} rows -> base {n_base} + delta {n_all - n_base} "
              f"(split at {key} <= {thr})")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0], a[1], a[2], float(a[3]) if len(a) > 3 else 0.95)
