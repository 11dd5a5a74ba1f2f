#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare.

Usage: python3 scripts/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <out>/<name> parquet dir written by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB (tables registered from the
sf dir), sorts columns by name and rows by all columns, and compares.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_weak = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            status = "WEAK(rows-only)" if len(got) else "WEAK(EMPTY!)"
            n_weak += 1
            print(f"{status:18s} {name}: rows={len(got)}")
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"ORACLE-ERR        {name}: {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL-SCHEMA       {name}: got={list(g.columns)} exp={list(e.columns)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            # dtype-kind check mimicking the driver's value-hash: int widths
            # stringify identically (r2 evidence), but int-vs-float (123 vs
            # 123.0) and naive-vs-tz-aware timestamps break the hash.
            def kind(t):
                # Collapse to what actually breaks the driver's value hash:
                # int-vs-float and naive-vs-tz-aware timestamps. Widths
                # (int32/int64, float32/float64) and datetime units
                # (ns vs us) stringify identically, so they collapse too.
                k = t.kind if hasattr(t, "kind") else "O"
                if k in "iu":
                    return "i"
                if k == "f":
                    return "f"
                if k == "M":
                    return "M-tz" if getattr(t, "tz", None) is not None else "M"
                return str(t) if k != "O" else "O"
            if [kind(t) for t in g.dtypes] != [kind(t) for t in e.dtypes]:
                print(f"FAIL-DTYPE        {name}: got={[str(t) for t in g.dtypes]} exp={[str(t) for t in e.dtypes]}")
                n_fail += 1
                continue
            print(f"PASS              {name}: rows={len(g)}")
            n_pass += 1
        except AssertionError as ex:
            msg = str(ex).split("\n")[0:6]
            print(f"FAIL-VALUES       {name}: rows got={len(g)} exp={len(e)} :: " + " | ".join(msg))
            n_fail += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_weak} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
