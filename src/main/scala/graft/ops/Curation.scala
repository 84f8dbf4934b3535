package graft.ops

import graft.Tables
import graft.multimodal.Multimodal
import graft.text.{Dedup, TextAnalysis}
import graft.vector.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data-curation operator inventory (builder prompt: dedup,
  * similarity search, multimodal, text analysis), exposed as driver
  * queries. SQL-expressible ops carry a DuckDB oracle in
  * [[CurationOracle]]; hash-free (approximate / engine-hash-dependent)
  * ops are rows-only checked by the driver and recall/property-tested in
  * ScalaTest.
  */
object Curation {

  /** q21 — token statistics per language (oracle-checked). */
  def docTokens(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val nTok = TextAnalysis.tokenCount(col("text"))
    docs.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(nTok).cast("long").as("total_tokens"),
        round(avg(nTok), 4).as("avg_tokens"))
      .orderBy(col("lang"))
  }

  private val oracleStopwords =
    Seq("the", "of", "and", "a", "to", "in", "is", "it", "that", "for")

  /** q22 — quality-signal aggregates per source (oracle-checked):
    * average length and stopword ratio, the two signals shared verbatim
    * with the DuckDB oracle. The full composite lives in
    * [[TextAnalysis.qualityScore]] (property-tested).
    */
  def docQuality(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val toks = split(col("text"), " ")
    val stopHits = size(filter(split(lower(col("text")), " "),
      t => t.isin(oracleStopwords: _*)))
    val ratio = stopHits.cast("double") / greatest(size(toks), lit(1)).cast("double")
    docs.groupBy(col("source"))
      .agg(
        round(avg(length(col("text")).cast("double")), 4).as("avg_len"),
        round(avg(ratio), 6).as("stop_ratio"))
      .orderBy(col("source"))
  }

  /** q23 — MinHash-LSH near-dup pairs (rows-only: Spark-hash-dependent;
    * recall vs exact dups is ScalaTest-asserted). */
  def dedupMinhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.nearMinhash(Tables.load(spark, dir, "documents"), "doc_id", "text",
        shingleLen = 3, b = 16, r = 4, threshold = 0.8)
      .orderBy(col("id_a"), col("id_b"))

  /** q24 — SimHash near-dup pairs (rows-only). */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.nearSimhash(Tables.load(spark, dir, "documents"), "doc_id", "text",
        maxHamming = 3)
      .orderBy(col("id_a"), col("id_b"))

  /** q25 — exact n-gram Jaccard near-dup pairs (oracle-checked: the
    * inverted-index join is exact, so DuckDB can reproduce it). */
  def dedupNgram(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccard(Tables.load(spark, dir, "documents"), "doc_id", "text",
        shingleLen = 3, threshold = 0.5)
      .orderBy(col("id_a"), col("id_b"))

  /** q26 — embedding cosine near-dup pairs above 0.35 (oracle-checked). */
  def embedNearDup(spark: SparkSession, dir: String): DataFrame =
    Similarity.nearDupCosine(Tables.load(spark, dir, "embeddings"),
        "vec_id", "embedding", threshold = 0.35)
      .orderBy(col("id_a"), col("id_b"))

  /** q27 — heuristic language-ID distribution (rows-only; the heuristic
    * is not an oracle-able SQL contract). */
  def langIdDist(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .groupBy(TextAnalysis.langId(col("text")).as("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("pred_lang"))

  /** q28 — document fingerprint cardinality (rows-only: xxhash64-based).
    * n_distinct_fp == n_unique texts ⇔ no fingerprint collisions. */
  def fingerprintStats(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(TextAnalysis.fingerprint(col("text")).as("fp"))
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("fp")).as("n_distinct_fp"))

  /** q29 — ANN cosine top-5 for query vector 0 (rows-only: approximate;
    * recall@5 vs the exact Q13 is ScalaTest-asserted). */
  def annTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    Similarity.annTopK(
        emb.filter(col("vec_id") =!= 0), "vec_id", "embedding",
        emb.filter(col("vec_id") === 0), "vec_id", "embedding", k = 5)
      .orderBy(col("rk"))
  }

  /** q30 — multimodal payload metadata stats (oracle-checked: byte
    * lengths of the payload column round-trip exactly). */
  def mmMeta(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    Multimodal.withPayload(docs, "text", "source")
      .groupBy(col("meta.source").as("source"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("meta.n_bytes")).as("total_bytes"))
      .orderBy(col("source"))
  }

  /** q31 — approximate distinct users per event type (rows-only; bound
    * vs exact Q06 is ScalaTest-asserted per SURVEY A3). */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.05).as("approx_u"))
      .orderBy(col("event_type"))

  val all: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q21_doc_tokens" -> (docTokens _),
    "q22_doc_quality" -> (docQuality _),
    "q23_dedup_minhash" -> (dedupMinhash _),
    "q24_dedup_simhash" -> (dedupSimhash _),
    "q25_dedup_ngram" -> (dedupNgram _),
    "q26_embed_neardup" -> (embedNearDup _),
    "q27_lang_id" -> (langIdDist _),
    "q28_fingerprint" -> (fingerprintStats _),
    "q29_ann_topk" -> (annTopK _),
    "q30_mm_meta" -> (mmMeta _),
    "q31_approx_distinct" -> (approxDistinct _))

  val allNames: Seq[String] = all.map(_._1)
}
