#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables and compare (schema + values) with the
parquet dumped by graft.Verify. Usage:
    python3 tools/check.py <sfdir> <verify-out-dir>
"""
import sys, glob, os, json
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def load_spark(outdir, name):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        return None
    return pq.read_table(files[0]).to_pandas()

def canon(df):
    import datetime
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            # parquet date32 arrives as object-of-datetime.date while DuckDB
            # DATE arrives as datetime64 — normalize to datetime64 so the
            # dtype-kind check below flags real drift, not representation
            nonnull = df[c].dropna()
            if len(nonnull) and isinstance(nonnull.iloc[0], datetime.date) \
                    and not isinstance(nonnull.iloc[0], datetime.datetime):
                df[c] = pd.to_datetime(df[c])
            else:
                df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    ok = fail = 0
    for name in sorted(os.listdir(outdir)):
        if not os.path.isdir(f"{outdir}/{name}"):
            continue
        spark_df = load_spark(outdir, name)
        if spark_df is None:
            print(f"MISS  {name}: no spark output"); fail += 1; continue
        if name not in oracles:
            print(f"ROWS  {name}: rows={len(spark_df)} (rows-only, no oracle)")
            ok += 1 if len(spark_df) > 0 else 0
            if len(spark_df) == 0:
                print(f"  !! EMPTY rows-only result"); fail += 1
            continue
        try:
            duck_df = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"ERR   {name}: oracle failed: {e}"); fail += 1; continue
        s, d = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL  {name}: columns {list(s.columns)} vs {list(d.columns)}"); fail += 1; continue
        # Driver-strictness mirror: a float64 oracle column vs an int64 Spark
        # column hashes differently even when values compare equal (the r8
        # x10 HUGEINT lesson) — treat dtype kind drift as a failure.
        dt = [(c, s[c].dtype, d[c].dtype) for c in s.columns
              if s[c].dtype.kind != d[c].dtype.kind]
        if dt:
            print(f"FAIL  {name}: dtype drift: " +
                  "; ".join(f"{c}: spark {a} vs oracle {b}" for c, a, b in dt))
            fail += 1; continue
        if len(s) != len(d):
            print(f"FAIL  {name}: rows {len(s)} vs {len(d)}"); fail += 1; continue
        if len(s) == 0:
            print(f"WARN  {name}: both empty (weak)"); ok += 1; continue
        mism = []
        for c in s.columns:
            a, b = s[c], d[c]
            try:
                eq = (a == b) | (a.isna() & b.isna())
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                idx = (~eq).idxmax()
                mism.append((c, a[idx], b[idx], (~eq).sum()))
        if mism:
            print(f"FAIL  {name}: {len(mism)} col mismatches: " +
                  "; ".join(f"{c}: {a!r} vs {b!r} (x{n})" for c, a, b, n in mism[:3]))
            fail += 1
        else:
            print(f"OK    {name}: {len(s)} rows")
            ok += 1
    print(f"\n{ok} ok, {fail} fail")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
