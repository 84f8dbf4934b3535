#!/usr/bin/env python3
"""Pandas-path replica of the driver's comparator.

tools/check.py canonicalizes DuckDB results via fetchall() (native
Python values); the DRIVER's comparator goes through pandas DataFrames,
where dtype coercions differ — CORRECTNESS_r03's q52 red cell was a
HUGEINT→float64 rendering ('1.0' vs '1') that the fetchall path cannot
see. This variant renders both sides the way pandas would: DuckDB via
.df(), Spark parquet via pyarrow→to_pandas, cells str()'d after the
sort, so dtype-level divergence surfaces locally before the driver
finds it.

Usage: python3 tools/check_pandas.py <sfDir> <verifyOutDir> [query...]
"""
import sys, json, hashlib, glob, os
import duckdb
import pyarrow.parquet as pq


def canon_df(df):
    df = df[sorted(df.columns)]
    try:
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    except TypeError:
        pass  # unsortable cells: keep produced order (both sides ordered)
    out = []
    for row in df.itertuples(index=False):
        out.append("|".join("NULL" if v is None or (isinstance(v, float) and v != v)
                            else str(v) for v in row))
    return hashlib.sha256("\n".join(out).encode()).hexdigest()[:16], out


def main(sf_dir, out_dir, only):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        con.sql(f"CREATE VIEW {os.path.basename(p)[:-8]} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        o_hash, o_rows = canon_df(con.sql(oracle[name]).df())
        spark_dir = f"{out_dir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"{name}: MISSING spark output"); n_bad += 1; continue
        # date_as_object=False: parquet DATE -> datetime64, rendering
        # 'YYYY-MM-DD 00:00:00' like DuckDB's TIMESTAMP .df() column —
        # matches the driver's observed behavior (r03 passed the
        # date-valued queries q09/q19/q36)
        s_hash, s_rows = canon_df(
            pq.read_table(spark_dir).to_pandas(date_as_object=False))
        ok = o_hash == s_hash
        n_ok += ok; n_bad += (not ok)
        print(f"{name}: {'OK' if ok else 'MISMATCH'} oracle={o_hash} spark={s_hash}")
        if not ok:
            for i, (a, b) in enumerate(zip(o_rows, s_rows)):
                if a != b:
                    print(f"  first diff row {i}:\n    oracle: {a}\n    spark : {b}")
                    break
    print(f"\n{n_ok} OK, {n_bad} mismatched")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
