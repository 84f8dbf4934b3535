package graft.vector

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic (embedding-space) dedup: exactness at numCells=1, recall of
  * exact duplicates at any cell count, and dedup/pairs consistency. */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("numCells=1 recovers the exact all-pairs near-dup set") {
    initQuiet()
    val semantic = SemanticDedup.semanticPairs(emb, "vec_id", "embedding", 0.35, numCells = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = Similarity.nearDupCosine(emb, "vec_id", "embedding", 0.35)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(semantic == exact)
  }

  test("clustered pairs ⊆ exact pairs; exact duplicates always caught") {
    // inject byte-identical copies of two vectors under fresh ids
    val dups = emb.filter(col("vec_id").isin(3L, 17L))
      .withColumn("vec_id", col("vec_id") + 100000L)
    val corpus = emb.unionByName(dups)
    val pairs = SemanticDedup.semanticPairs(corpus, "vec_id", "embedding", 0.35, numCells = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = Similarity.nearDupCosine(corpus, "vec_id", "embedding", 0.35)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.subsetOf(exact), s"clustered found non-pairs: ${pairs -- exact}")
    // identical embeddings share a cell at ANY numCells — never missed
    assert(pairs.contains((3L, 100003L)) && pairs.contains((17L, 100017L)))
  }

  test("a zero-norm embedding pairs with nothing and survives dedup") {
    // cosine(0⃗, v) is defined as 0.0 (not NaN — which Spark orders
    // ABOVE every tau, so one zero vector would otherwise pair with its
    // whole cell and dedup would collapse the cell to one doc)
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    val zero = Seq((999999L, Array.fill(dim)(0f))).toDF("vec_id", "embedding")
    val corpus = emb.select("vec_id", "embedding").unionByName(zero)
    val pairs = SemanticDedup.semanticPairs(corpus, "vec_id", "embedding", 0.35, numCells = 1)
    assert(pairs.filter(col("id_a") === 999999L || col("id_b") === 999999L).count() == 0,
      "zero vector paired with something")
    val kept = SemanticDedup.dedup(corpus, "vec_id", "embedding", 0.35, numCells = 1)
    assert(kept.filter(col("vec_id") === 999999L).count() == 1,
      "zero vector was deduped away")
  }

  test("empty corpus dedups to empty, not a trainer error") {
    val empty = emb.limit(0)
    assert(SemanticDedup.semanticPairs(empty, "vec_id", "embedding", 0.35).count() == 0)
    assert(SemanticDedup.dedup(empty, "vec_id", "embedding", 0.35).count() == 0)
  }

  test("width-mismatched embedding fails fast instead of silently escaping dedup") {
    val poisoned = emb.unionByName(
      emb.limit(1).withColumn("vec_id", lit(424242L))
        .withColumn("embedding", slice(col("embedding"), 1, 3)))
    val err = intercept[Exception] {
      SemanticDedup.semanticPairs(poisoned, "vec_id", "embedding", 0.35, numCells = 4)
        .collect()
    }
    assert(err.getMessage.contains("dim mismatch"), s"wrong error: ${err.getMessage}")
  }

  test("dedup keeps one representative per component, passes unpaired rows") {
    val dups = emb.filter(col("vec_id").isin(3L, 17L))
      .withColumn("vec_id", col("vec_id") + 100000L)
    val corpus = emb.unionByName(dups)
    val pairs = SemanticDedup.semanticPairs(corpus, "vec_id", "embedding", 0.35, numCells = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    val kept = SemanticDedup.dedup(corpus, "vec_id", "embedding", 0.35, numCells = 4)
      .select("vec_id").as[Long].collect().toSet

    // driver-side union-find ground truth over the same pair graph
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- pairs) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val all = corpus.select("vec_id").as[Long].collect().toSet
    val expected = all.filter(id => find(id) == id)
    assert(kept == expected)
    // the injected exact dups lost to their originals
    assert(!kept.contains(100003L) && !kept.contains(100017L) &&
      kept.contains(3L) && kept.contains(17L))
  }
}
