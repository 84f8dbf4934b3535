package graft.ops

/** DuckDB oracle SQL for [[Selection]] — same integer quantization
  * grids, same smoothing ASTs, same rank cuts (see each query's
  * scaladoc for the determinism contract).
  */
object SelectionOracle {

  val all: Seq[(String, String)] = Seq(

    // same ×1e6 term grid, same Laplace AST, same integer ppl-31 flag
    "q252_lm_quality" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, string_split(lower(text), ' ') AS t
        |  FROM documents WHERE len(string_split(lower(text), ' ')) >= 2),
        |db AS (
        |  SELECT doc_id, lang, t[i] AS a, t[i + 1] AS b, count(*) AS m
        |  FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
        |  GROUP BY 1, 2, 3, 4),
        |lm AS (
        |  SELECT a, b, CAST(sum(m) AS BIGINT) cab
        |  FROM db WHERE lang = 'en' GROUP BY a, b),
        |pref AS (SELECT a, CAST(sum(cab) AS BIGINT) ca FROM lm GROUP BY a),
        |v AS (SELECT CAST(count(DISTINCT b) AS BIGINT) v FROM lm),
        |doc AS (
        |  SELECT db.doc_id, db.lang,
        |         CAST(sum(db.m *
        |           CAST(round(ln(CAST(coalesce(pref.ca, 0) + v.v AS DOUBLE) /
        |                         (coalesce(lm.cab, 0) + 1)) * 1000000.0)
        |                AS BIGINT)) AS BIGINT) nll,
        |         CAST(sum(db.m) AS BIGINT) nb
        |  FROM db CROSS JOIN v
        |  LEFT JOIN lm ON lm.a = db.a AND lm.b = db.b
        |  LEFT JOIN pref ON pref.a = db.a
        |  GROUP BY 1, 2)
        |SELECT lang, CAST(count(*) AS BIGINT) n_docs,
        |       round(avg(exp(nll / (1000000.0 * nb))), 4) mean_ppl,
        |       CAST(sum(CASE WHEN nll > 3434000 * nb THEN 1 ELSE 0 END)
        |            AS BIGINT) n_high_ppl,
        |       round(sum(CASE WHEN nll > 3434000 * nb THEN 1 ELSE 0 END) /
        |             CAST(count(*) AS DOUBLE), 6) high_share
        |FROM doc GROUP BY lang ORDER BY lang""".stripMargin,

    // same λ grid (one ln of an exact integer ratio per token), same
    // shared add-one support, same (n + 3) DIV 4 rank cut
    "q253_dsir_select" ->
      """WITH tk AS (
        |  SELECT doc_id, source, lang,
        |         unnest(string_split(lower(text), ' ')) AS w
        |  FROM documents),
        |pd AS (
        |  SELECT doc_id, source, lang, w, count(*) m
        |  FROM tk GROUP BY 1, 2, 3, 4),
        |raw AS (SELECT w, CAST(sum(m) AS BIGINT) rw FROM pd GROUP BY w),
        |tot AS (SELECT CAST(sum(rw) AS BIGINT) r0,
        |               CAST(count(*) AS BIGINT) vv FROM raw),
        |tgt AS (SELECT w, CAST(sum(m) AS BIGINT) tw
        |        FROM pd WHERE lang = 'en' GROUP BY w),
        |t0 AS (SELECT CAST(sum(tw) AS BIGINT) t0 FROM tgt),
        |lam AS (
        |  SELECT raw.w,
        |         CAST(round(ln(
        |           (CAST(coalesce(tgt.tw, 0) + 1 AS DOUBLE) *
        |            (tot.r0 + tot.vv)) /
        |           (CAST(raw.rw + 1 AS DOUBLE) * (t0.t0 + tot.vv)))
        |           * 1000000.0) AS BIGINT) lam
        |  FROM raw LEFT JOIN tgt ON raw.w = tgt.w
        |  CROSS JOIN tot CROSS JOIN t0),
        |doc AS (
        |  SELECT pd.doc_id, pd.source,
        |         CAST(sum(pd.m * lam.lam) AS BIGINT) wgt,
        |         CAST(sum(pd.m) AS BIGINT) nt
        |  FROM pd JOIN lam ON pd.w = lam.w GROUP BY 1, 2),
        |r AS (
        |  SELECT *,
        |         row_number() OVER (PARTITION BY source
        |                            ORDER BY wgt DESC, doc_id) rn,
        |         count(*) OVER (PARTITION BY source) n
        |  FROM doc)
        |SELECT source, CAST(count(*) AS BIGINT) n_docs,
        |       CAST(sum(CASE WHEN rn <= (n + 3) // 4 THEN 1 ELSE 0 END)
        |            AS BIGINT) n_selected,
        |       CAST(sum(CASE WHEN rn <= (n + 3) // 4 THEN nt ELSE 0 END)
        |            AS BIGINT) tokens_selected,
        |       round(avg(CASE WHEN rn <= (n + 3) // 4
        |                      THEN wgt / 1000000.0 END), 4) mean_w_sel,
        |       round(avg(wgt / 1000000.0), 4) mean_w_all
        |FROM r GROUP BY source ORDER BY source""".stripMargin,

    // same pow/share/entropy ASTs over the |langs| x 4 grid
    "q254_temperature_mix" ->
      """WITH bl AS (
        |  SELECT lang,
        |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) tokens
        |  FROM documents GROUP BY lang),
        |g AS (
        |  SELECT alpha, lang, tokens,
        |         pow(CAST(tokens AS DOUBLE), alpha) p
        |  FROM bl CROSS JOIN
        |    (SELECT CAST(unnest([0.3, 0.5, 0.7, 1.0]) AS DOUBLE) alpha) a),
        |s AS (
        |  SELECT *, sum(p) OVER (PARTITION BY alpha) ps,
        |         sum(tokens) OVER (PARTITION BY alpha) tt
        |  FROM g),
        |sh AS (SELECT *, p / ps tshare FROM s),
        |e AS (
        |  SELECT *,
        |         exp(-sum(tshare * ln(tshare)) OVER (PARTITION BY alpha)) el
        |  FROM sh)
        |SELECT alpha, lang, tokens,
        |       round(tokens / CAST(tt AS DOUBLE), 6) raw_share,
        |       round(tshare, 6) temp_share,
        |       round(tshare * tt / CAST(tokens AS DOUBLE), 4) eff_epochs,
        |       round(el, 4) eff_langs
        |FROM e ORDER BY alpha, lang""".stripMargin,

    // same distinct-5-shingle inverted index, same integer 5u >= 4s flag
    "q255_memorization_risk" ->
      """WITH toks AS (
        |  SELECT doc_id, source, string_split(lower(text), ' ') AS t
        |  FROM documents WHERE len(string_split(lower(text), ' ')) >= 5),
        |sh AS (
        |  SELECT DISTINCT doc_id, source,
        |         array_to_string(t[i:i + 4], ' ') AS s
        |  FROM toks, unnest(generate_series(1, len(t) - 4)) AS u(i)),
        |df AS (SELECT s, count(*) df FROM sh GROUP BY s),
        |doc AS (
        |  SELECT sh.doc_id, sh.source, count(*) ns,
        |         sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) nu
        |  FROM sh JOIN df ON sh.s = df.s GROUP BY 1, 2)
        |SELECT source, CAST(count(*) AS BIGINT) n_docs,
        |       round(avg(nu / CAST(ns AS DOUBLE)), 4) mean_unique_frac,
        |       CAST(sum(CASE WHEN 5 * nu >= 4 * ns THEN 1 ELSE 0 END)
        |            AS BIGINT) n_high_risk,
        |       CAST(sum(nu) AS BIGINT) n_unique_shingles
        |FROM doc GROUP BY source ORDER BY source""".stripMargin,

    // same ×1e6 quantization, same exact integer dots/norms, same
    // closed-form cosine (the q250 vector idiom)
    "q256_class_separation" ->
      """WITH q AS (
        |  SELECT vec_id, label,
        |         list_transform(embedding,
        |           x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))
        |           qv
        |  FROM embeddings),
        |s0 AS (SELECT label,
        |              unnest(list_transform(qv, (x, i) -> {'pos': i, 'v': x}),
        |                     recursive := true)
        |       FROM q),
        |cent AS (
        |  SELECT label, list(sv ORDER BY pos) c
        |  FROM (SELECT label, pos, CAST(sum(v) AS BIGINT) sv
        |        FROM s0 GROUP BY label, pos)
        |  GROUP BY label),
        |wv AS (
        |  SELECT q.label,
        |         CAST(list_sum(list_transform(q.qv,
        |           (x, i) -> CAST(x AS HUGEINT) * cent.c[i])) AS DOUBLE) /
        |         (sqrt(CAST(list_sum(list_transform(q.qv,
        |            x -> CAST(x AS HUGEINT) * x)) AS DOUBLE)) *
        |          sqrt(CAST(list_sum(list_transform(cent.c,
        |            x -> CAST(x AS HUGEINT) * x)) AS DOUBLE))) cosv
        |  FROM q JOIN cent ON q.label = cent.label),
        |w AS (SELECT label, CAST(count(*) AS BIGINT) n, avg(cosv) wc
        |      FROM wv GROUP BY label),
        |pair AS (
        |  SELECT a.label,
        |         CAST(list_sum(list_transform(a.c,
        |           (x, i) -> CAST(x AS HUGEINT) * b.c[i])) AS DOUBLE) /
        |         (sqrt(CAST(list_sum(list_transform(a.c,
        |            x -> CAST(x AS HUGEINT) * x)) AS DOUBLE)) *
        |          sqrt(CAST(list_sum(list_transform(b.c,
        |            x -> CAST(x AS HUGEINT) * x)) AS DOUBLE))) cosc
        |  FROM cent a CROSS JOIN cent b WHERE a.label <> b.label),
        |o AS (SELECT label, max(cosc) mo FROM pair GROUP BY label)
        |SELECT w.label, w.n,
        |       round(w.wc, 4) within_cos,
        |       round(o.mo, 4) max_other_cos,
        |       round(w.wc - o.mo, 4) margin
        |FROM w JOIN o ON w.label = o.label ORDER BY w.label""".stripMargin,

    // same (count desc, token) rank order, same 100-term log-log
    // regression AST
    "q258_zipf_slope" ->
      """WITH tk AS (
        |  SELECT source, unnest(string_split(lower(text), ' ')) AS w
        |  FROM documents),
        |f AS (SELECT source, w, count(*) c FROM tk GROUP BY 1, 2),
        |r AS (
        |  SELECT source, c,
        |         row_number() OVER (PARTITION BY source
        |                            ORDER BY c DESC, w) rk
        |  FROM f),
        |top AS (SELECT * FROM r WHERE rk <= 100)
        |SELECT source, CAST(count(*) AS BIGINT) n_ranks,
        |       CASE WHEN count(*) > 1 THEN
        |         round((count(*) * sum(ln(rk) * ln(c)) -
        |                sum(ln(rk)) * sum(ln(c))) /
        |               (count(*) * sum(ln(rk) * ln(rk)) -
        |                sum(ln(rk)) * sum(ln(rk))), 4)
        |       ELSE NULL END zipf_slope,
        |       CAST(max(c) AS BIGINT) top_freq
        |FROM top GROUP BY source ORDER BY source""".stripMargin,

    // same distinct source-grain 8-gram postings, same ordered-pair
    // containment
    "q259_ngram_containment" ->
      """WITH toks AS (
        |  SELECT source, string_split(lower(text), ' ') AS t
        |  FROM documents WHERE len(string_split(lower(text), ' ')) >= 8),
        |g AS (
        |  SELECT DISTINCT source, array_to_string(t[i:i + 7], ' ') AS s
        |  FROM toks, unnest(generate_series(1, len(t) - 7)) AS u(i)),
        |sz AS (SELECT source, count(*) n_grams FROM g GROUP BY source),
        |inter AS (
        |  SELECT a.source source_a, b.source source_b, count(*) shared
        |  FROM g a JOIN g b ON a.s = b.s AND a.source <> b.source
        |  GROUP BY 1, 2)
        |SELECT source_a, source_b, CAST(shared AS BIGINT) shared,
        |       CAST(sz.n_grams AS BIGINT) n_grams_a,
        |       round(shared / CAST(sz.n_grams AS DOUBLE), 6) containment
        |FROM inter JOIN sz ON sz.source = source_a
        |ORDER BY source_a, source_b""".stripMargin,

    // same md5-mixed fixed-size sample, same exact-integer dots, same
    // (sim rounded 6 desc, id) neighbor order and occurrence buckets
    "q260_hubness" ->
      """WITH s0 AS (
        |  SELECT vec_id,
        |         list_transform(embedding,
        |           x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))
        |           qv,
        |         CASE WHEN md5_number_lower(CAST(vec_id AS VARCHAR))
        |                   >= 9223372036854775808
        |              THEN CAST(md5_number_lower(CAST(vec_id AS VARCHAR))
        |                        AS HUGEINT) - 18446744073709551616
        |              ELSE CAST(md5_number_lower(CAST(vec_id AS VARCHAR))
        |                        AS HUGEINT) END AS hv
        |  FROM embeddings),
        |smp AS (SELECT vec_id, qv FROM s0 ORDER BY hv, vec_id LIMIT 1000),
        |pairs AS (
        |  SELECT a.vec_id, b.vec_id nid,
        |         round(CAST(list_sum(list_transform(a.qv,
        |                 (x, i) -> CAST(x AS HUGEINT) * b.qv[i])) AS DOUBLE) /
        |               (sqrt(CAST(list_sum(list_transform(a.qv,
        |                  x -> CAST(x AS HUGEINT) * x)) AS DOUBLE)) *
        |                sqrt(CAST(list_sum(list_transform(b.qv,
        |                  x -> CAST(x AS HUGEINT) * x)) AS DOUBLE))), 6) sim
        |  FROM smp a CROSS JOIN smp b WHERE a.vec_id <> b.vec_id),
        |top AS (
        |  SELECT nid FROM (
        |    SELECT nid, row_number() OVER (PARTITION BY vec_id
        |                                   ORDER BY sim DESC, nid) rk
        |    FROM pairs) WHERE rk <= 10),
        |cited AS (SELECT nid vec_id, count(*) occ FROM top GROUP BY nid),
        |occ AS (
        |  SELECT coalesce(cited.occ, 0) occ
        |  FROM smp LEFT JOIN cited ON smp.vec_id = cited.vec_id),
        |b AS (
        |  SELECT CASE WHEN occ = 0 THEN '0'
        |              WHEN occ <= 2 THEN '1-2'
        |              WHEN occ <= 5 THEN '3-5'
        |              WHEN occ <= 10 THEN '6-10'
        |              ELSE '11+' END occ_bucket, occ
        |  FROM occ),
        |tot AS (SELECT count(*) n FROM b)
        |SELECT occ_bucket, CAST(count(*) AS BIGINT) n_vectors,
        |       CAST(max(occ) AS BIGINT) max_occ,
        |       round(count(*) / CAST(tot.n AS DOUBLE), 6) occ_share
        |FROM b CROSS JOIN tot GROUP BY occ_bucket, tot.n
        |ORDER BY occ_bucket""".stripMargin,

    // same (lang, n_chars DIV 50) quasi-identifier classes, same k = 5
    "q261_k_anonymity" ->
      """WITH q AS (
        |  SELECT doc_id, source, lang, n_chars // 50 AS len_band
        |  FROM documents),
        |cls AS (SELECT lang, len_band, count(*) sz FROM q GROUP BY 1, 2)
        |SELECT source, CAST(count(*) AS BIGINT) n_docs,
        |       CAST(sum(CASE WHEN cls.sz < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |         n_risky,
        |       round(sum(CASE WHEN cls.sz < 5 THEN 1 ELSE 0 END) /
        |             CAST(count(*) AS DOUBLE), 6) risky_share
        |FROM q JOIN cls USING (lang, len_band)
        |GROUP BY source ORDER BY source""".stripMargin,

    // same md5 low-64 little-endian mixer as q188, signed + pmod 16
    "q257_shard_balance" ->
      """WITH h AS (
        |  SELECT CASE WHEN md5_number_lower(CAST(doc_id AS VARCHAR))
        |                   >= 9223372036854775808
        |              THEN CAST(md5_number_lower(CAST(doc_id AS VARCHAR))
        |                        AS HUGEINT) - 18446744073709551616
        |              ELSE CAST(md5_number_lower(CAST(doc_id AS VARCHAR))
        |                        AS HUGEINT) END AS hv,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) nt,
        |         n_chars
        |  FROM documents),
        |g AS (
        |  SELECT CAST(((hv % 16) + 16) % 16 AS BIGINT) shard,
        |         CAST(count(*) AS BIGINT) n_docs,
        |         CAST(sum(nt) AS BIGINT) tokens,
        |         CAST(sum(n_chars) AS BIGINT) chars
        |  FROM h GROUP BY 1)
        |SELECT shard, n_docs, tokens, chars,
        |       round(n_docs / CAST(sum(n_docs) OVER () AS DOUBLE), 6)
        |         doc_share,
        |       round(chars / CAST(sum(chars) OVER () AS DOUBLE), 6)
        |         char_share
        |FROM g ORDER BY shard""".stripMargin)
}
