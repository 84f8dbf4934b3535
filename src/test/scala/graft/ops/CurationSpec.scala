package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing + mixture resampling semantics. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("packSequences: hand-computed chunk spans") {
    // token stream: [3,4,2,5,1] concatenated -> cum [3,7,9,14,15], seqLen 4
    val docs = Seq((1L, 3L), (2L, 4L), (3L, 2L), (4L, 5L), (5L, 1L))
      .toDF("doc_id", "n_tok")
    val out = Curation.packSequences(docs, "doc_id", "n_tok", seqLen = 4)
      .orderBy("doc_id")
      .select("doc_id", "start_tok", "seq_first", "seq_last", "n_seqs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 0L, 0L, 0L, 1L),
      (2L, 3L, 0L, 1L, 2L),
      (3L, 7L, 1L, 2L, 2L),
      (4L, 9L, 2L, 3L, 2L),
      (5L, 14L, 3L, 3L, 1L)), out.mkString(","))
  }

  test("packSequences: bucketed prefix sum is invariant to bucket size and layout") {
    val docs = Tables.load(spark, sf, "documents")
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
    def run(bucket: Long, parts: Int) =
      Curation.packSequences(docs.repartition(parts), "doc_id", "n_tok",
          seqLen = 128, docsPerBucket = bucket)
        .select("doc_id", "start_tok", "n_seqs")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    val small = run(2, 3)
    assert(small == run(1000000, 13), "bucket size changed the packing")
    // global offsets really accumulate: last doc's start = total minus its tokens
    val total = docs.agg(sum("n_tok")).head().getLong(0)
    val last = small.last
    val lastTok = docs.orderBy(col("doc_id").desc).select("n_tok").head().getLong(0)
    assert(last._2 == total - lastTok, s"bad final offset: $last vs total $total")
  }

  test("sourceMix: bottleneck keeps everything, mixture approaches weights, rest dropped") {
    val docs = Tables.load(spark, sf, "documents")
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
    val weights = Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src7" -> 0.1)
    val u = pmod(col("doc_id") * lit(2654435761L), lit(1000000L))
    val kept = Curation.sourceMix(docs, "source", "n_tok", weights, u).cache()
    try {
      // only weighted sources survive
      val srcs = kept.select("source").distinct().as[String].collect().toSet
      assert(srcs.subsetOf(weights.keySet), s"unweighted sources kept: $srcs")
      // the bottleneck source (min tokens/weight) is kept in full
      val tots = docs.filter(col("source").isin(weights.keys.toSeq: _*))
        .groupBy("source").agg(sum("n_tok").as("t"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val bottleneck = weights.keys.minBy(s => tots(s) / weights(s))
      val keptBn = kept.filter(col("source") === bottleneck).count()
      val allBn = docs.filter(col("source") === bottleneck).count()
      assert(keptBn == allBn, s"bottleneck $bottleneck lost rows: $keptBn/$allBn")
      // achieved token shares approach the targets (doc-granular sampling
      // on ~25-doc sources: generous ±12 pp)
      val keptTok = kept.groupBy("source").agg(sum("n_tok").as("t"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val totalKept = keptTok.values.sum.toDouble
      weights.foreach { case (s, w) =>
        val share = keptTok.getOrElse(s, 0L) / totalKept
        assert(math.abs(share - w) < 0.12, f"$s share $share%.3f vs target $w")
      }
    } finally kept.unpersist()
  }

  test("epochShuffle: reproducible per epoch, different across epochs, row-preserving") {
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "source")
    for (shuf <- Seq(Curation.epochShuffle _, Curation.epochShuffleMixed _)) {
      def order(epoch: Int, parts: Int) =
        shuf(docs.repartition(parts), "doc_id", epoch, 4)
          .select("doc_id").collect().map(_.getLong(0)).toSeq
      val e1 = order(1, 3)
      // same epoch, different input layout -> identical order
      assert(e1 == order(1, 11), "epoch order depends on input layout")
      // different epoch -> different order, same row set
      val e2 = order(2, 3)
      assert(e1 != e2, "epochs produced identical orders")
      assert(e1.toSet == e2.toSet && e1.size == docs.count(), "rows lost or duplicated")
      // not the identity order (the key actually permutes)
      assert(e1 != e1.sorted, "epoch shuffle left the corpus in id order")
    }
  }

  test("packSequences rejects null ids with a clear error") {
    val docs = Seq((Some(1L), 3L), (None, 4L)).toDF("doc_id", "n_tok")
    val e = intercept[IllegalArgumentException] {
      Curation.packSequences(docs, "doc_id", "n_tok", seqLen = 4)
    }
    assert(e.getMessage.contains("null doc_id"), e.getMessage)
  }

  test("packSequences: bucket-count cap raises BEFORE the driver collect") {
    // docsPerBucket=1 → one bucket per doc; with the cap forced below
    // the doc count the named guard must fire (the enforced form of the
    // bounded-driver contract, not a crash-later OOM)
    val docs = Tables.load(spark, sf, "documents")
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
    val e = intercept[IllegalArgumentException] {
      Curation.packSequences(docs, "doc_id", "n_tok", seqLen = 128,
        docsPerBucket = 1, maxDriverBuckets = 10)
    }
    assert(e.getMessage.contains("raise docsPerBucket"), e.getMessage)
    // at the default cap the same call works
    assert(Curation.packSequences(docs, "doc_id", "n_tok", seqLen = 128,
      docsPerBucket = 1).count() == docs.count())
  }

  test("packBins: hand-computed next-fit, oversize isolation, capacity") {
    // id order with cap 7: 3+3=6, +3>7 -> bins [{1,2}, {3}]; oversize
    // doc 4 (nt=9) gets its own bin; doc 5 opens a fresh one after it
    val docs = Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 9L), (5L, 2L))
      .toDF("doc_id", "n_tok")
    val out = Curation.packBins(docs, "doc_id", "n_tok", seqLen = 7)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(1L)._1 == out(2L)._1, "first two 3-token docs share a bin")
    assert(out(3L)._1 != out(1L)._1, "third doc overflows into the next bin")
    assert(out(4L)._2 && !out(1L)._2, "only the 9-token doc is oversize")
    assert(out.values.filter(_._1 == out(4L)._1).size == 1, "oversize doc is alone")
    assert(out(5L)._1 != out(4L)._1, "nothing joins the oversize doc's bin")
    // every doc assigned exactly once
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L))
    // zero-token docs must not let an oversize doc share their bin
    // (fill stays 0 there — isolation rides bin OCCUPANCY, not fill)
    val zeros = Seq((1L, 0L), (2L, 0L), (3L, 100L), (4L, 1L))
      .toDF("doc_id", "n_tok")
    val z = Curation.packBins(zeros, "doc_id", "n_tok", seqLen = 7)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(z(1L)._1 == z(2L)._1, "zero-token docs share a bin")
    assert(z(3L)._2 && z.values.count(_._1 == z(3L)._1) == 1,
      s"oversize doc not isolated among zero-token neighbors: $z")
    assert(z(4L)._1 != z(3L)._1)
  }

  test("packBins: invariants on the corpus — capacity, coverage, waste bound, determinism") {
    val seqLen = 256
    val docs = Tables.load(spark, sf, "documents")
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      .filter(col("n_tok") <= seqLen) // waste bound assumes fitting docs
    val out = Curation.packBins(docs, "doc_id", "n_tok", seqLen, docsPerBucket = 64)
    assert(out.count() == docs.count(), "every doc exactly once")
    val fills = out.groupBy(col("bin_id")).agg(sum(col("n_tok")).as("fill"))
    assert(fills.filter(col("fill") > seqLen).count() == 0, "bin over capacity")
    // the GUARANTEED next-fit bound (not a universal >50%): within a
    // bucket, consecutive bins sum past seqLen, so across B buckets
    // total fill > (nBins - B)/2 * seqLen
    val Seq(totalFill, nBins) = fills.agg(sum(col("fill")), count(lit(1)))
      .head().toSeq.map(_.asInstanceOf[Long])
    val nBuckets = docs.select(floor(col("doc_id") / 64).cast("long")).distinct().count()
    assert(totalFill > (nBins - nBuckets) * seqLen / 2,
      s"fill $totalFill under the pairwise bound (bins=$nBins buckets=$nBuckets)")
    // layout-invariant: same assignment from a different partitioning
    val again = Curation.packBins(docs.repartition(17), "doc_id", "n_tok",
        seqLen, docsPerBucket = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val first = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(first == again, "assignment depends on layout")
    // null ids and null token counts raise with NAMED errors; duplicate
    // ids raise (assignment undefined without a total id order)
    val withNull = Seq((Some(1L), Some(3L)), (None, Some(4L))).toDF("doc_id", "n_tok")
    val e = intercept[Exception] {
      Curation.packBins(withNull, "doc_id", "n_tok", seqLen = 4).collect()
    }
    assert(e.getMessage.contains("packBins"), e.getMessage)
    val withNullTok = Seq((Some(1L), Some(3L)), (Some(2L), None)).toDF("doc_id", "n_tok")
    val e2 = intercept[Exception] {
      Curation.packBins(withNullTok, "doc_id", "n_tok", seqLen = 4).collect()
    }
    assert(e2.getMessage.contains("packBins"), e2.getMessage)
    val dup = Seq((1L, 3L), (1L, 4L)).toDF("doc_id", "n_tok")
    val e3 = intercept[Exception] {
      Curation.packBins(dup, "doc_id", "n_tok", seqLen = 4).collect()
    }
    assert(e3.getMessage.contains("duplicate id"), e3.getMessage)
    // NON-INTEGRAL ids/tokens (cast to null, not null pre-cast) must hit
    // the same named raise, not an unnamed NPE in the tuple encoder
    val strId = Seq(("a-uuid", 3L), ("b-uuid", 4L)).toDF("doc_id", "n_tok")
    val e4 = intercept[Exception] {
      Curation.packBins(strId, "doc_id", "n_tok", seqLen = 4).collect()
    }
    assert(e4.getMessage.contains("packBins"), e4.getMessage)
    val strTok = Seq((1L, "three"), (2L, "four")).toDF("doc_id", "n_tok")
    val e5 = intercept[Exception] {
      Curation.packBins(strTok, "doc_id", "n_tok", seqLen = 4).collect()
    }
    assert(e5.getMessage.contains("packBins"), e5.getMessage)
  }

  test("sourceMix: deterministic across layouts; missing weighted source rejected") {
    val docs = Tables.load(spark, sf, "documents")
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
    val weights = Map("src3" -> 0.5, "src4" -> 0.5)
    val u = pmod(col("doc_id") * lit(2654435761L), lit(1000000L))
    val a = Curation.sourceMix(docs, "source", "n_tok", weights, u)
      .select("doc_id").as[Long].collect().toSet
    val b = Curation.sourceMix(docs.repartition(17), "source", "n_tok", weights, u)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b, "sampling depends on layout")
    intercept[IllegalArgumentException] {
      Curation.sourceMix(docs, "source", "n_tok", Map("nope" -> 1.0), u)
    }
  }

  test("bernoulliSample: deterministic, layout-invariant, rate ≈ fraction, salts independent") {
    val df = spark.range(0, 20000).toDF("id")
    val a = Curation.bernoulliSample(df, "id", 0.10, salt = 7L)
      .collect().map(_.getLong(0)).toSet
    val b = Curation.bernoulliSample(df.repartition(13), "id", 0.10, salt = 7L)
      .collect().map(_.getLong(0)).toSet
    assert(a == b, "kept set depends on layout")
    assert(math.abs(a.size / 20000.0 - 0.10) < 0.02, s"rate ${a.size / 20000.0}")
    val c = Curation.bernoulliSample(df, "id", 0.10, salt = 8L)
      .collect().map(_.getLong(0)).toSet
    assert(a != c, "different salts must draw different samples")
    assert(Curation.bernoulliSample(df, "id", 0.0).count() == 0)
    assert(Curation.bernoulliSample(df, "id", 1.0).count() == 20000)
    // ids in the same residue class mod 1000003 decide INDEPENDENTLY
    // (the high-bits term breaks the class) — a single small-modulus mix
    // would keep or drop the whole class together
    val classIds = (0L until 8L).map(k => 5L + k * 1000003L)
    val ck = Curation.bernoulliSample(classIds.toDF("id"), "id", 0.5, salt = 1L)
      .collect().map(_.getLong(0)).toSet
    assert(ck.nonEmpty && ck.size < classIds.size,
      s"residue class shares one fate: kept ${ck.size} of ${classIds.size}")
    // null ids raise instead of silently shrinking the sample
    val withNull = Seq[Option[Long]](Some(1L), None).toDF("id")
    val err = intercept[Exception] {
      Curation.bernoulliSample(withNull, "id", 1.0).collect()
    }
    assert(err.getMessage.contains("bernoulliSample"), s"wrong error: ${err.getMessage}")
    // negative ids raise too: pmod/% and shiftright disagree across
    // engines on negatives, so they'd silently diverge from the oracle
    val withNeg = Seq(1L, -5L).toDF("id")
    val errNeg = intercept[Exception] {
      Curation.bernoulliSample(withNeg, "id", 1.0).collect()
    }
    assert(errNeg.getMessage.contains("bernoulliSample"), s"wrong error: ${errNeg.getMessage}")
  }

  test("capPerSource: big sources land at the cap, small pass whole, layout-stable") {
    val df = (0L until 100L).map(i => (i, "big")) ++ (1000L until 1030L).map(i => (i, "small"))
    val d = df.toDF("id", "source")
    val capped = Curation.capPerSource(d, "source", "id", cap = 40)
    val bySrc = capped.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc == Map("big" -> 40L, "small" -> 30L))
    // deterministic across layouts: same kept ids
    val a = capped.select("id").collect().map(_.getLong(0)).toSet
    val b = Curation.capPerSource(d.repartition(7), "source", "id", cap = 40)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b, "kept set depends on layout")
    // null ids raise (Spark sorts nulls first — they would silently
    // fill the cap ahead of real docs)
    val withNull = (Seq[Option[Long]](Some(1L), None)).map(o => (o, "s")).toDF("id", "source")
    val err = intercept[Exception] {
      Curation.capPerSource(withNull, "source", "id", cap = 1).collect()
    }
    assert(err.getMessage.contains("capPerSource"), s"wrong error: ${err.getMessage}")
    // string ids cast to null WITHOUT error — the guard must catch the
    // casted value, not just literal nulls
    val strIds = Seq(("doc-a", "s"), ("doc-b", "s")).toDF("id", "source")
    val err2 = intercept[Exception] {
      Curation.capPerSource(strIds, "source", "id", cap = 1).collect()
    }
    assert(err2.getMessage.contains("capPerSource"), s"wrong error: ${err2.getMessage}")
  }

  test("moment stats match driver-side computation") {
    val m = Curation.momentStats(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1).toDouble)).groupBy(_._1)
    for ((src, rows) <- docs) {
      val xs = rows.map(_._2)
      val mean = xs.sum / xs.length
      val pvar = xs.map(x => (x - mean) * (x - mean)).sum / xs.length
      val (n, m1, v) = m(src)
      assert(n == xs.length)
      assert(math.abs(m1 - mean) < 1e-4, s"$src mean $m1 vs $mean")
      assert(math.abs(v - pvar) < 1e-2 * math.max(pvar, 1), s"$src var $v vs $pvar")
    }
  }

  test("prioritySample: deterministic, layout-invariant, matches driver replay") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "n_chars")
    val a = Curation.prioritySample(docs, "doc_id", "n_chars", k = 10, salt = 11L)
      .select("doc_id").collect().map(_.getLong(0))
    val b = Curation.prioritySample(docs.repartition(7), "doc_id", "n_chars", 10, 11L)
      .select("doc_id").collect().map(_.getLong(0))
    assert(a.sameElements(b), "selection must not depend on layout")
    // replay the fixed-point priority on the driver
    val replay = docs.collect().map { r =>
      val id = r.getLong(0); val w = r.getLong(2)
      val inner = ((id % 1000003L) * 2654435761L + (id >> 16) * 7919L + 11L * 10007L) % 1000000007L
      val u = (inner * 2654435761L) % 1000000007L % 1000000L
      (((u + 1L) * 1000000L) / w, id)
    }.sorted.take(10).map(_._2)
    assert(a.sameElements(replay))
  }

  test("prioritySample: heavier rows are preferentially selected") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "n_chars")
    val k = 10
    val sel = Curation.prioritySample(docs, "doc_id", "n_chars", k, salt = 3L)
      .agg(org.apache.spark.sql.functions.avg("n_chars")).collect().head.getDouble(0)
    val all = docs.agg(org.apache.spark.sql.functions.avg("n_chars")).collect().head.getDouble(0)
    assert(sel > all, s"weighted sample mean $sel should exceed corpus mean $all")
  }

  test("prioritySample: guards raise on bad ids, weights, k") {
    import spark.implicits._
    val df = Seq((1L, 5L), (-2L, 5L)).toDF("id", "w")
    val boom = intercept[Exception](
      Curation.prioritySample(df, "id", "w", 1).collect())
    assert(boom.getMessage.contains("prioritySample"))
    val zeroW = Seq((1L, 0L)).toDF("id", "w")
    val boomW = intercept[Exception](
      Curation.prioritySample(zeroW, "id", "w", 1).collect())
    assert(boomW.getMessage.contains("positive"))
    intercept[IllegalArgumentException](
      Curation.prioritySample(df, "id", "w", 0))
  }

  test("split leakage: fold cells conserve the near-dup pair total") {
    initQuiet()
    val cells = Curation.splitLeakage(spark, sf).collect()
    assert(cells.nonEmpty)
    val total = cells.map(_.getLong(2)).sum
    val pairs = graft.text.Dedup.ngramJaccard(
      graft.Tables.load(spark, sf, "documents"), "doc_id", "text", 3, 0.5)
      .count()
    assert(total == pairs, s"cells sum $total != pair count $pairs")
    cells.foreach { r =>
      assert(r.getBoolean(3) == (r.getString(0) != r.getString(1)))
    }
  }

  test("cross-source overlap matrix: canonical pair order, rate in (0,1]") {
    initQuiet()
    val out = Curation.crossSourceOverlap(spark, sf).collect()
    assert(out.nonEmpty) // the corpus carries near-dup pairs by design
    out.foreach { r =>
      assert(r.getString(0) <= r.getString(1)) // unordered cell canon
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0)
    }
  }

  test("dupSpectrum: doc mass conserved; k*n_clusters = n_docs per row") {
    initQuiet()
    val out = Curation.dupSpectrum(spark, sf).collect()
    val totalDocs = Tables.load(spark, sf, "documents").count()
    assert(out.map(_.getLong(2)).sum == totalDocs)
    out.foreach(r => assert(r.getLong(0) * r.getLong(1) == r.getLong(2)))
    assert(math.abs(out.map(_.getDouble(3)).sum - 1.0) < 1e-4)
  }

  test("bm25Query: top-20, strictly positive, descending rounded scores") {
    initQuiet()
    val out = Curation.bm25Query(spark, sf).collect()
    assert(out.length == 20)
    assert(out.forall(_.getDouble(1) > 0.0))
    out.map(_.getDouble(1)).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a >= b); case _ => ()
    }
  }

  test("collocations: supported bigrams, descending rounded pmi") {
    initQuiet()
    val out = Curation.collocationsQuery(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 20)
    assert(out.forall(_.getLong(2) >= 20L))
    out.map(_.getDouble(3)).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a >= b); case _ => ()
    }
  }

  test("centroidAuditOf: perfectly separated clusters classify at 1.0") {
    initQuiet()
    // two orthogonal tight clusters -> nearest centroid is always own
    val rows = (0 until 4).map(i =>
      (i.toLong, 0, Array(1.0f, 0.02f * i, 0f))) ++
      (4 until 8).map(i => (i.toLong, 1, Array(0.02f * i, 0f, -1.0f)))
    val df = rows.toDF("vec_id", "label", "embedding")
    val out = Curation.centroidAuditOf(df).collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getLong(1) == 4L && r.getLong(2) == 4L)
      assert(r.getDouble(3) == 1.0)
      assert(r.getDouble(4) > 0.9 && r.getDouble(5) <= 1.0)
    }
  }
  test("negativeSamples: 3 candidates per customer; kept + rejected = candidates") {
    initQuiet()
    val rows = Curation.negativeSamples(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_candidates") == 3 * r.getAs[Long]("n_customers"))
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_rejected") ==
        r.getAs[Long]("n_candidates"))
    }
  }

  test("condEntropyQuery: entropy and perplexity obey their identities") {
    initQuiet()
    val rows = Curation.condEntropyQuery(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Double]("cond_entropy")
      assert(h >= 0.0)
      // perplexity = e^H (both rounded to 4dp independently)
      assert(math.abs(r.getAs[Double]("perplexity") - math.exp(h)) <
        math.exp(h) * 1e-3)
      assert(r.getAs[Long]("n_prefixes") <= r.getAs[Long]("n_bigrams"))
    }
  }

  test("featureHashAudit: bucket algebra holds at 65536-wide hashing") {
    initQuiet()
    val rows = Curation.featureHashAudit(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tok, bk) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_buckets"))
      assert(bk <= tok && bk <= 65536L)
      val rate = r.getAs[Double]("collision_rate")
      assert(rate >= 0.0 && rate < 1.0)
      // pigeonhole: heaviest bucket carries at least the mean load
      assert(r.getAs[Long]("max_bucket_types") >=
        (tok + 65535) / 65536)
    }
  }

  test("canonicalKeepBest: keepers count the distinct normalized keys") {
    initQuiet()
    val rows = Curation.canonicalKeepBest(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_dropped") ===
        r.getAs[Long]("n_docs"))
    }
    val keptTotal = rows.map(_.getAs[Long]("n_kept")).sum
    val docs = graft.Tables.load(spark, sf, "documents")
    val distinctKeys = docs.select(
      md5(graft.text.TextAnalysis.normalize(col("text")))).distinct().count()
    assert(keptTotal === distinctKeys)
    val charTotal = rows.map(r => r.getAs[Long]("kept_chars") +
      r.getAs[Long]("dropped_chars")).sum
    val corpusChars = docs.agg(sum(col("n_chars"))).head().getLong(0)
    assert(charTotal === corpusChars)
  }

  test("mixtureDriftQuery: shares partition to 1; KL total non-negative") {
    initQuiet()
    val rows = Curation.mixtureDriftQuery(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
    // Gibbs: KL(p || t) >= 0 even though single terms can be negative
    assert(rows.map(_.getAs[Double]("kl_term")).sum >= -1e-6)
    val t = rows.head.getAs[Double]("target_share")
    assert(rows.forall(_.getAs[Double]("target_share") == t))
  }

  test("unigramKlQuery: Gibbs non-negativity; token mass reconciles") {
    initQuiet()
    val rows = Curation.unigramKlQuery(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // KL >= 0 per source (4dp rounding slack only)
      assert(r.getAs[Double]("kl_to_corpus") >= -1e-3)
      assert(r.getAs[Long]("vocab") > 0)
    }
    val totalTokens = rows.map(_.getAs[Long]("n_tokens")).sum
    // recompute corpus token count independently
    val expected = graft.Tables.load(spark, sf, "documents")
      .select(size(split(lower(col("text")), " ")).cast("long").as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    assert(totalTokens === expected)
  }

  test("standardizedRateQuery: rates bounded; reweighting is real") {
    initQuiet()
    val rows = Curation.standardizedRateQuery(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (crude, std) = (r.getAs[Double]("crude_rate"),
        r.getAs[Double]("standardized_rate"))
      assert(crude >= 0.0 && crude <= 1.0)
      // standardized rate is a sub-convex combination (missing strata
      // contribute 0), so it can never exceed 1
      assert(std >= 0.0 && std <= 1.0)
      assert(r.getAs[Long]("n_langs") > 0)
    }
  }

  test("kappaQuery: cells partition docs; kappa <= agreement bound") {
    initQuiet()
    val r = Curation.kappaQuery(spark, sf).collect()
    assert(r.length === 1)
    val row = r.head
    val total = row.getAs[Long]("both_dup") + row.getAs[Long]("ngram_only") +
      row.getAs[Long]("simhash_only") + row.getAs[Long]("neither")
    assert(total === row.getAs[Long]("n_docs"))
    val (po, k) = (row.getAs[Double]("agreement"), row.getAs[Double]("kappa"))
    assert(po >= 0.0 && po <= 1.0)
    assert(k <= 1.0 + 1e-9 && k <= po + 1e-6) // kappa never exceeds po
  }

  test("detectorAudit: confusion algebra holds; F1 between P and R") {
    initQuiet()
    val r = Curation.detectorAudit(spark, sf).collect()
    assert(r.length === 1)
    val row = r.head
    val (nt, np) = (row.getAs[Long]("n_truth"), row.getAs[Long]("n_pred"))
    val (tp, fp, fn) = (row.getAs[Long]("tp"), row.getAs[Long]("fp"),
      row.getAs[Long]("fn"))
    assert(nt === tp + fn)
    assert(np === tp + fp)
    assert(nt > 0 && np > 0)
    val (p, rc, f1) = (row.getAs[Double]("precision"),
      row.getAs[Double]("recall"), row.getAs[Double]("f1"))
    assert(f1 >= math.min(p, rc) - 1e-6 && f1 <= math.max(p, rc) + 1e-6)
  }

  test("burrowsDeltaQuery: all unordered source pairs, delta >= 0") {
    initQuiet()
    val rows = Curation.burrowsDeltaQuery(spark, sf).collect()
    val k = graft.Tables.load(spark, sf, "documents")
      .select("source").distinct().count()
    assert(rows.length === (k * (k - 1) / 2).toInt)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1)) // unordered, each pair once
      assert(r.getAs[Long]("n_words") <= 50L)
      assert(r.getAs[Double]("delta") >= 0.0)
    }
  }

  test("heapsLaw: monotone prefixes; decile 10 equals the corpus totals") {
    initQuiet()
    val rows = Curation.heapsLaw(spark, sf).collect()
    assert(rows.length === 10)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("cum_docs") <= b.getAs[Long]("cum_docs"))
      assert(a.getAs[Long]("cum_tokens") <= b.getAs[Long]("cum_tokens"))
      assert(a.getAs[Long]("cum_types") <= b.getAs[Long]("cum_types"))
    }
    val docs = graft.Tables.load(spark, sf, "documents")
    val last = rows.last
    assert(last.getAs[Long]("cum_docs") === docs.count())
    assert(last.getAs[Long]("cum_tokens") ===
      docs.select(sum(size(split(col("text"), " ")))).collect()
        .head.getLong(0))
    assert(last.getAs[Long]("cum_types") ===
      docs.select(explode(split(col("text"), " "))).distinct().count())
    // the same fitted β on every row
    assert(rows.map(_.getAs[Double]("heaps_beta")).distinct.length === 1)
  }

  test("tokenBudget: equals the single-window greedy selection; fits budget") {
    initQuiet()
    val out = Curation.tokenBudget(spark, sf).collect()
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("nt"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("nt").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val oracle = docs
      .withColumn("cumw", sum(col("nt")).over(w))
      .withColumn("tot", sum(col("nt")).over(Window.partitionBy(col("source"))))
      .groupBy(col("source"))
      .agg(expr("max(tot) DIV 2").as("budget_tokens"),
        sum(when(col("cumw") <= expr("tot DIV 2"), 1L).otherwise(0L))
          .as("n_kept"),
        sum(when(col("cumw") <= expr("tot DIV 2"), col("nt")).otherwise(0L))
          .as("tokens_kept"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    val got = out.map(r => (r.getString(0), r.getAs[Long]("budget_tokens"),
      r.getAs[Long]("n_kept"), r.getAs[Long]("tokens_kept"))).sortBy(_._1)
    assert(got.toSeq === oracle.toSeq)
    out.foreach { r =>
      assert(r.getAs[Long]("tokens_kept") <= r.getAs[Long]("budget_tokens"))
      assert(r.getAs[Double]("utilization") <= 1.0)
    }
  }

  test("embedOutliers: outlier fraction bounded by the p95 rank rule") {
    initQuiet()
    val rows = Curation.embedOutliers(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      val out = r.getAs[Long]("n_outliers")
      // strictly-above-p95 leaves at most n - ceil(0.95 n) rows
      assert(out <= n - (19 * n + 19) / 20)
      assert(r.getAs[Double]("p95_dist") >= 0.0)
      assert(r.getAs[Double]("rms_dist") > 0.0)
    }
  }

  test("padWaste: equals the ntile-window formulation; monotone in B") {
    initQuiet()
    val rows = Curation.padWaste(spark, sf).collect()
      .map(r => (r.getAs[Long]("n_buckets"), r.getAs[Long]("padded_tokens"),
        r.getAs[Long]("real_tokens"), r.getAs[Long]("pad_tokens")))
    assert(rows.map(_._1).toSeq === Seq(1L, 2L, 4L, 8L, 16L))
    // brute-force twin: literal ntile window at test scale
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(size(split(col("text"), " ")).cast("long").as("len"))
    val expect = Seq(1, 2, 4, 8, 16).map { b =>
      val g = docs
        .withColumn("bucket",
          ntile(b).over(Window.orderBy(col("len"))))
        .groupBy("bucket")
        .agg(max(col("len")).as("hi"), count(lit(1)).as("sz"),
          sum(col("len")).as("s"))
        .agg(sum(col("hi") * col("sz")).as("padded"), sum(col("s")).as("real"))
        .collect().head
      (b.toLong, g.getLong(0), g.getLong(1), g.getLong(0) - g.getLong(1))
    }
    assert(rows.toSeq === expect)
    // more buckets never pad more
    rows.sliding(2).foreach { case Array(a, b) => assert(b._4 <= a._4) }
  }
}
