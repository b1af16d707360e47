#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Reads each `<verifyOutDir>/<name>` parquet written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB against the sfDir tables,
and compares: schema (column names), row count, and values (columns sorted by
name, rows sorted by all columns — conservative: also reports whether the
unsorted row order already matched).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # ns→us alignment for any datetime col
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})")
            failures += 1
            continue
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        a, b = canon(spark_df.copy()), canon(duck_df.copy())
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            failures += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            failures += 1
            continue
        # dtype-KIND mismatch (int vs float, e.g. DuckDB HUGEINT→float64)
        # hash-mismatches in the driver even when values compare equal here
        kinds = [(c, a[c].dtype.kind, b[c].dtype.kind) for c in a.columns
                 if a[c].dtype.kind != b[c].dtype.kind]
        if kinds:
            print(f"FAIL {name}: dtype-kind mismatch {kinds}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                          check_exact=True)
            exact = True
        except AssertionError as e:
            exact = False
            msg = str(e).split("\n")[0:6]
        if exact:
            print(f"PASS {name}: {len(a)} rows")
        else:
            failures += 1
            print(f"FAIL {name}: value mismatch")
            for line in msg:
                print("   ", line)
            # show first differing cells
            for c in a.columns:
                neq = ~((a[c] == b[c]) | (a[c].isna() & b[c].isna()))
                if neq.any():
                    i = neq.idxmax()
                    print(f"    col {c} first diff at row {i}: "
                          f"{a[c][i]!r} vs {b[c][i]!r} ({neq.sum()} cells)")
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
