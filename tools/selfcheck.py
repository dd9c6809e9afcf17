#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tool only; the
deliverable library is pure Scala). Runs each oracle SQL from
outDir/oracle_sql.json in DuckDB over the sf parquet tables and
compares with the Spark result parquet: row count, column names,
and values (sorted rows, columns sorted by name, exact match with a
tiny float tolerance fallback so we can see HOW CLOSE a mismatch is).

Usage: python3 tools/selfcheck.py <outDir> <sfDir>
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def load(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    return con, oracles

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def cmp(name, spark_df, duck_df):
    if len(spark_df) != len(duck_df):
        return f"ROWS {len(spark_df)} vs {len(duck_df)}"
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        return f"COLS {sorted(spark_df.columns)} vs {sorted(duck_df.columns)}"
    a, b = canon(spark_df), canon(duck_df)
    bad = []
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype(float); bv = bv.astype(float)
            diff = (av - bv).abs()
            nmask = av.isna() != bv.isna()
            if nmask.any():
                bad.append(f"{c}: null-mismatch {int(nmask.sum())}")
            elif (diff.fillna(0) > 0).any():
                exceed = int((diff.fillna(0) > 1e-9).sum())
                bad.append(f"{c}: {int((diff.fillna(0)>0).sum())} diffs, {exceed} beyond 1e-9, max {diff.max():.3g}")
        else:
            av2 = av.astype(str); bv2 = bv.astype(str)
            n = int((av2 != bv2).sum())
            if n:
                ex = [(x, y) for x, y in zip(av2, bv2) if x != y][:3]
                bad.append(f"{c}: {n} mismatches e.g. {ex}")
    return "; ".join(bad) if bad else None

def main(outdir, sfdir):
    con, oracles = load(outdir, sfdir)
    fails = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_df = pd.read_parquet(f"{outdir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})"); fails += 1; continue
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); fails += 1; continue
        err = cmp(name, spark_df, duck_df)
        if err:
            print(f"FAIL {name}: {err}"); fails += 1
        else:
            print(f"OK   {name}: {len(spark_df)} rows x {len(spark_df.columns)} cols")
    # queries without oracle: rows-only
    import os
    for d in sorted(os.listdir(outdir)):
        p = os.path.join(outdir, d)
        if os.path.isdir(p) and d not in oracles:
            try:
                n = len(pd.read_parquet(p))
                print(f"ROWS {d}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
                if n == 0: fails += 1
            except Exception as e:
                print(f"FAIL {d}: unreadable ({e})"); fails += 1
    print(f"{'ALL GREEN' if fails == 0 else str(fails) + ' FAILURES'}")
    return fails

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
