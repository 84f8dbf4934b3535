#!/usr/bin/env python3
"""Empirical pin for q268's cross-engine cosine assumption (r10 ADVICE):
does DuckDB's list_cosine_similarity compose the denominator as
sqrt(na)*sqrt(nb) — like graft's CosineSimilarity expression — or as
sqrt(na*nb), which differs by ulps once na*nb exceeds 2^53?

Generates random integer-grid vectors at the q268 quantization scale
(|x| <= 3.2e5, 64-dim — norms ~6.5e12, products ~4e25 >> 2^53), keeps
pairs where the two compositions disagree in double, and checks which
one DuckDB reproduces bit-exactly. Also prints the engine's zero-norm
convention (Spark pins 0.0; DuckDB versions vary between -1.0 and NaN —
why q268 filters zero-quantizing reps on BOTH sides instead of relying
on either convention).

r11 result on this container's DuckDB: 200/200 divergent pairs match
sqrt(na)*sqrt(nb), 0/200 match sqrt(na*nb); zero-norm returns -1.0.
"""
import duckdb, math, random

random.seed(7)

def ssum(xs):  # sequential left-to-right sum, the order both engines use
    s = 0.0
    for x in xs:
        s += x
    return s

matches_split, matches_fused, checked = 0, 0, 0
for _ in range(20000):
    a = [float(random.randint(-320000, 320000)) for _ in range(64)]
    b = [float(random.randint(-320000, 320000)) for _ in range(64)]
    na = ssum([x * x for x in a])
    nb = ssum([x * x for x in b])
    dot = ssum([x * y for x, y in zip(a, b)])
    s_split = dot / (math.sqrt(na) * math.sqrt(nb))
    s_fused = dot / math.sqrt(na * nb)
    if s_split == s_fused:
        continue  # compositions agree on this pair; not informative
    r = duckdb.sql(
        "SELECT list_cosine_similarity($1::DOUBLE[], $2::DOUBLE[])",
        params=[a, b]).fetchone()[0]
    checked += 1
    matches_split += r == s_split
    matches_fused += r == s_fused
    if checked >= 200:
        break

print(f"divergent pairs checked: {checked}")
print(f"duckdb == sqrt(na)*sqrt(nb): {matches_split}")
print(f"duckdb == sqrt(na*nb):       {matches_fused}")
z = duckdb.sql("SELECT list_cosine_similarity([0.0,0.0]::DOUBLE[],"
               " [1.0,2.0]::DOUBLE[])").fetchone()[0]
print(f"duckdb zero-norm cosine: {z!r} (Spark CosineSimilarity pins 0.0)")
assert matches_split == checked and matches_fused == 0, (
    "DuckDB's composition changed — re-audit q268's exactness argument")
