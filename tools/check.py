#!/usr/bin/env python3
"""Local dev replica of the driver's t2 correctness gate.

Runs each oracle_sql.json query in DuckDB over the given sf dir and
compares with the Verify.scala parquet dumps (columns sorted by name,
cells str()-rendered, rows joined, sha256[:16]) per SURVEY.md §5.3.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, hashlib, glob, os
import duckdb
import pyarrow.parquet as pq

def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        cells = ["NULL" if r[i] is None else str(r[i]) for i in order]
        out.append("|".join(cells))
    text = "\n".join(out)
    return hashlib.sha256(text.encode()).hexdigest()[:16], text

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        res = con.sql(oracle[name])
        o_hash, o_text = canon(res.fetchall(), res.columns)
        spark_dir = f"{out_dir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"{name}: MISSING spark output"); n_bad += 1; continue
        t = pq.read_table(spark_dir)
        rows = [tuple(d.values()) for d in t.to_pylist()]
        s_hash, s_text = canon(rows, t.column_names)
        ok = o_hash == s_hash
        n_ok += ok; n_bad += (not ok)
        print(f"{name}: {'OK' if ok else 'MISMATCH'} oracle={o_hash} spark={s_hash}")
        if not ok:
            ol, sl = o_text.split("\n"), s_text.split("\n")
            print(f"  oracle cols sorted: {sorted(res.columns)} spark: {sorted(t.column_names)}")
            print(f"  rows: oracle={len(ol)} spark={len(sl)}")
            for i, (a, b) in enumerate(zip(ol, sl)):
                if a != b:
                    print(f"  first diff row {i}:\n    oracle: {a}\n    spark : {b}")
                    break
    print(f"\n{n_ok} OK, {n_bad} mismatched")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
