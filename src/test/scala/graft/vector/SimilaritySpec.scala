package graft.vector

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, sf, "embeddings")

  test("ANN recall@5 >= 0.8 vs brute force over 20 queries") {
    val queries = emb.filter(col("vec_id") < 20)
    val corpus = emb.filter(col("vec_id") >= 20)
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("id"))).toSet
    val approx = Similarity.annTopK(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("id"))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall@5 = $recall")
  }

  test("near-dup cosine: exact and LSH paths agree on high-sim pairs") {
    val exact = Similarity.nearDupCosine(emb, "vec_id", "embedding", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.nearDupCosine(emb, "vec_id", "embedding", 0.5, useLsh = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // LSH is a subset (candidates only); at tau=0.5 it must keep most
    assert(lsh.subsetOf(exact))
    if (exact.nonEmpty)
      assert(lsh.size.toDouble / exact.size >= 0.5, s"lsh=${lsh.size} exact=${exact.size}")
  }

  test("approx distinct within 3*rsd of exact (SURVEY A3)") {
    val events = Tables.load(spark, sf, "events")
    val exact = events.groupBy("event_type").agg(countDistinct("user_id").as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = events.groupBy("event_type")
      .agg(approx_count_distinct("user_id", 0.05).as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      assert(math.abs(approx(k) - ex) <= math.max(3 * 0.05 * ex, 1.0),
        s"$k: approx=${approx(k)} exact=$ex")
    }
  }
}
