#!/usr/bin/env python3
"""Re-measure the BASELINE.md table: DuckDB executing the Q01-Q20 oracle
SQL over the sf0.1 parquet, 4 runs each (first discarded), median of the
last 3, at threads=32 and threads=1, with the canonical result hash
(same canonicalization as tools/check.py).

Usage: python3 tools/baseline.py <sfDir> <oracle_sql.json> [markdown]
"""
import sys, json, hashlib, glob, os, statistics, time
import duckdb

def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        out.append("|".join("NULL" if r[i] is None else str(r[i]) for i in order))
    return hashlib.sha256("\n".join(out).encode()).hexdigest()[:16]

def connect(sf_dir, threads):
    con = duckdb.connect()
    con.sql(f"SET threads={threads}")
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[: -len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    return con

def measure(con, sql):
    times, hashes, nrows = [], [], 0
    for _ in range(4):
        t0 = time.perf_counter()
        res = con.sql(sql)
        rows = res.fetchall()
        times.append((time.perf_counter() - t0) * 1000)
        hashes.append(canon(rows, res.columns))
        nrows = len(rows)
    stable = len(set(hashes)) == 1
    return statistics.median(times[1:]), hashes[0], nrows, stable

def main(sf_dir, oracle_path, emit_md=False):
    oracle = json.load(open(oracle_path))
    names = sorted(k for k in oracle if k[0] == "q" and k[1:3].isdigit()
                   and int(k[1:3]) <= 20)
    con32 = connect(sf_dir, 32)
    con1 = connect(sf_dir, 1)
    rows, t32_total, t1_total = [], 0.0, 0.0
    for name in names:
        t32, h, n, stable32 = measure(con32, oracle[name])
        t1, h1, _, stable1 = measure(con1, oracle[name])
        assert h == h1, f"{name}: threads=32 vs threads=1 hash diverged"
        rows.append((name, t32, t1, n, h, stable32 and stable1))
        t32_total += t32
        t1_total += t1
        print(f"{name}: {t32:.1f} ms (t32) {t1:.1f} ms (t1) rows={n} "
              f"hash={h} stable={stable32 and stable1}")
    print(f"TOTAL: {t32_total:.1f} ms (t32) {t1_total:.1f} ms (t1)")
    if emit_md:
        print("\n| query | value (median ms, threads=32) | value (median ms, threads=1) | rows out | result hash (sf0.1) |")
        print("|---|---:|---:|---:|---|")
        for name, t32, t1, n, h, _ in rows:
            print(f"| {name} | {t32:.1f} | {t1:.1f} | {n} | `{h}` |")
        print(f"| **TOTAL** | **{t32_total:.1f}** | **{t1_total:.1f}** | | |")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], len(sys.argv) > 3 and sys.argv[3] == "markdown")
