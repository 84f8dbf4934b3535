package graft.ops

/** DuckDB oracle SQL for the SQL-expressible subset of [[Curation]].
  * q23/q24 (Spark-hash-dependent LSH), q27/q28 (heuristic/xxhash64),
  * q29/q31 (approximate) are deliberately oracle-free — the driver
  * records rows-only checks and ScalaTest owns recall/bound assertions.
  */
object CurationOracle {

  val all: Seq[(String, String)] = Seq(
    "q21_doc_tokens" ->
      """SELECT lang, count(*) n_docs, CAST(sum(len(string_split(text,' '))) AS BIGINT) total_tokens,
        |       round(avg(len(string_split(text,' '))),4) avg_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q22_doc_quality" ->
      """SELECT source, round(avg(CAST(length(text) AS DOUBLE)),4) avg_len,
        |       round(avg(CAST(len(list_filter(string_split(lower(text),' '), x -> x IN ('the','of','and','a','to','in','is','it','that','for'))) AS DOUBLE) / greatest(len(string_split(text,' ')),1)),6) stop_ratio
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q25_dedup_ngram" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(string_split(text,' '))-2,1)+1),
        |      i -> array_to_string(string_split(text,' ')[i:i+2], ' '))) sh
        |  FROM documents)
        |SELECT a.doc_id id_a, b.doc_id id_b,
        |       round(CAST(len(list_intersect(a.sh,b.sh)) AS DOUBLE)/len(list_distinct(list_concat(a.sh,b.sh))),4) jaccard
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.sh,b.sh)) AS DOUBLE)/len(list_distinct(list_concat(a.sh,b.sh))) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,

    "q26_embed_neardup" ->
      """SELECT a.vec_id id_a, b.vec_id id_b,
        |       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])),6) sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.35
        |ORDER BY id_a, id_b""".stripMargin,

    "q30_mm_meta" ->
      """SELECT source, count(*) n, CAST(sum(octet_length(encode(text))) AS BIGINT) total_bytes
        |FROM documents GROUP BY source ORDER BY source""".stripMargin)
}
