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

  test("q268: zero-QUANTIZING vectors are structurally excluded on the Spark side") {
    // |x| < 5e-7 floats round to the all-zero grid vector — its cosine
    // is ENGINE-defined (Spark 0.0, DuckDB -1.0 here / NaN elsewhere),
    // so q268 filters such reps before pairing on BOTH sides rather
    // than letting either convention reach the tau filter. The corpus
    // never contains one (embeddings are unit-scale floats), so this
    // planted row is the only thing pinning the filter.
    initQuiet()
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    val tiny = Seq((999999L, 999L, Array.fill(dim)(1e-8f)))
      .toDF("vec_id", "label", "embedding")
    val corpus = emb.select(col("vec_id"), col("label"), col("embedding"))
      .unionByName(tiny.withColumn("label",
        col("label").cast(emb.schema("label").dataType)))
    val out = graft.ops.Curation.semanticClassesOf(corpus)
    assert(out.filter(col("id_a") === 999999L || col("id_b") === 999999L)
      .count() == 0, "zero-quantizing vector reached the pair output")
    assert(out.count() > 0) // the rest of the corpus still pairs
  }

  test("q268: the tau comparison is inclusive at an exactly-attained boundary") {
    // the ADVICE tau-boundary concern: a pair whose cosine lands
    // EXACTLY on tau must pass the >= filter, and one ulp above tau
    // must not. Integer-grid vectors with tiny norms make the cosine
    // arithmetic exact in double: a = 1 grid unit on axis 0 and
    // b = (3, 4) grid units give dot 3, norms 1 and 5, cos = 3/5 = 0.6
    // exactly (a representable double).
    initQuiet()
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    def vec(xs: (Int, Float)*): Array[Float] = {
      val a = Array.fill(dim)(0f); xs.foreach { case (i, v) => a(i) = v }; a
    }
    // quantized: a=(1e6·1e-6)=1 grid unit on axis 0; b=(3,4) grid units
    // → cos = 3/(1·5) = 0.6 exactly (all terms tiny integers in double)
    val rows = Seq(
      (1L, "x", vec(0 -> 1e-6f)),
      (2L, "x", vec(0 -> 3e-6f, 1 -> 4e-6f)))
      .toDF("vec_id", "label", "embedding")
    val pairs = SemanticDedup.semanticPairsWith(
      rows.select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * lit(1000000.0)).cast("long")
            .cast("double")).as("qv")),
      "vec_id", "qv", tau = 0.6, IndexedSeq(Seq.fill(dim)(0.0)))
    val got = pairs.select("id_a", "id_b", "sim").collect()
    assert(got.length == 1, s"boundary pair missed: ${got.toSeq}")
    assert(got.head.getDouble(2) == 0.6)
    // one ulp above tau excludes it — the comparison really is >= on
    // the raw (pre-round) similarity
    val pairsAbove = SemanticDedup.semanticPairsWith(
      rows.select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * lit(1000000.0)).cast("long")
            .cast("double")).as("qv")),
      "vec_id", "qv", tau = math.nextUp(0.6), IndexedSeq(Seq.fill(dim)(0.0)))
    assert(pairsAbove.count() == 0)
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
