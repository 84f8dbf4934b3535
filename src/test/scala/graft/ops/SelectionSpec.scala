package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class SelectionSpec extends SparkSpec {

  test("lmQuality: reference language scores best; shares well-formed") {
    initQuiet()
    val rows = Selection.lmQuality(spark, sf).collect()
    assert(rows.nonEmpty)
    val byLang = rows.map(r => r.getString(0) -> r).toMap
    assert(byLang.contains("en"))
    val enPpl = byLang("en").getAs[Double]("mean_ppl")
    // the en-trained LM must find en the most predictable language
    byLang.filterNot(_._1 == "en").values.foreach { r =>
      assert(enPpl < r.getAs[Double]("mean_ppl"),
        s"en $enPpl not below ${r.getString(0)}")
    }
    rows.foreach { r =>
      val share = r.getAs[Double]("high_share")
      assert(share >= 0.0 && share <= 1.0)
      assert(r.getAs[Long]("n_high_ppl") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Double]("mean_ppl") > 1.0)
    }
    // scored docs = all docs with >= 2 tokens
    val expected = graft.Tables.load(spark, sf, "documents")
      .filter(size(split(lower(col("text")), " ")) >= 2).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === expected)
  }

  test("lmScore / dsirWeights: empty reference/target slice fails fast") {
    initQuiet()
    val docs = graft.Tables.load(spark, sf, "documents")
    val e1 = intercept[IllegalArgumentException] {
      Selection.lmScore(docs, Seq("doc_id"), "text", lit(false))
    }
    assert(e1.getMessage.contains("refFilter matched no"))
    val e2 = intercept[IllegalArgumentException] {
      Selection.dsirWeights(docs, Seq("doc_id"), "text", lit(false))
    }
    assert(e2.getMessage.contains("targetFilter matched no"))
  }

  test("dsirSelect: exact quarter cut; selected quartile outranks the rest") {
    initQuiet()
    val rows = Selection.dsirSelect(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      assert(r.getAs[Long]("n_selected") === (n + 3) / 4)
      // top-quartile mean weight cannot be below the overall mean
      assert(r.getAs[Double]("mean_w_sel") >= r.getAs[Double]("mean_w_all"))
      assert(r.getAs[Long]("tokens_selected") >= 0L)
    }
    val total = graft.Tables.load(spark, sf, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === total)
  }

  test("temperatureMix: shares normalize; alpha=1 is the raw mix; " +
    "diversity decays toward raw as alpha rises") {
    initQuiet()
    val rows = Selection.temperatureMix(spark, sf).collect()
    val byAlpha = rows.groupBy(_.getAs[Double]("alpha"))
    assert(byAlpha.keySet === Set(0.3, 0.5, 0.7, 1.0))
    byAlpha.foreach { case (_, rs) =>
      val s = rs.map(_.getAs[Double]("temp_share")).sum
      assert(math.abs(s - 1.0) < 1e-4, s"shares sum $s")
      // every language in every mix
      assert(rs.length === byAlpha(1.0).length)
    }
    // at alpha = 1 the tempered share IS the raw share
    byAlpha(1.0).foreach { r =>
      assert(math.abs(r.getAs[Double]("temp_share") -
        r.getAs[Double]("raw_share")) < 1e-5)
      assert(math.abs(r.getAs[Double]("eff_epochs") - 1.0) < 1e-3)
    }
    // flattening (lower alpha) never reduces mix diversity
    val eff = byAlpha.toSeq.sortBy(_._1)
      .map(_._2.head.getAs[Double]("eff_langs"))
    eff.sliding(2).foreach { case Seq(lo, hi) => assert(lo >= hi - 1e-9) }
  }

  test("memorizationRisk: fractions bounded; unique mass matches df=1 count") {
    initQuiet()
    val rows = Selection.memorizationRisk(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val f = r.getAs[Double]("mean_unique_frac")
      assert(f >= 0.0 && f <= 1.0)
      assert(r.getAs[Long]("n_high_risk") <= r.getAs[Long]("n_docs"))
    }
    // Σ per-source unique shingles = corpus shingles with df = 1
    val sh = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), split(lower(col("text")), " ").as("t"))
      .filter(size(col("t")) >= 5)
      .select(col("doc_id"),
        explode(array_distinct(transform(sequence(lit(1), size(col("t")) - 4),
          i => concat_ws(" ", slice(col("t"), i, lit(5)))))).as("s"))
    val uniq = sh.groupBy("s").count().filter(col("count") === 1).count()
    assert(rows.map(_.getAs[Long]("n_unique_shingles")).sum === uniq)
  }

  test("classSeparation: cosines in [-1,1]; margin is the stated difference") {
    initQuiet()
    val rows = Selection.classSeparation(spark, sf).collect()
    assert(rows.length >= 2)
    val total = graft.Tables.load(spark, sf, "embeddings").count()
    assert(rows.map(_.getAs[Long]("n")).sum === total)
    rows.foreach { r =>
      val w = r.getAs[Double]("within_cos")
      val o = r.getAs[Double]("max_other_cos")
      assert(w >= -1.0 - 1e-9 && w <= 1.0 + 1e-9)
      assert(o >= -1.0 - 1e-9 && o <= 1.0 + 1e-9)
      assert(math.abs(r.getAs[Double]("margin") - (w - o)) <= 1e-3)
    }
  }

  test("shardBalance: every doc lands in exactly one of 16 shards") {
    initQuiet()
    val rows = Selection.shardBalance(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("shard")).forall(s => s >= 0 && s < 16))
    val docs = graft.Tables.load(spark, sf, "documents")
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs.count())
    val shareSum = rows.map(_.getAs[Double]("doc_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-3)
    // tokens/chars conserved
    assert(rows.map(_.getAs[Long]("chars")).sum ===
      docs.agg(sum(col("n_chars"))).collect().head.getLong(0))
  }

  test("zipfSlope: frequency falls with rank; rank count bounded") {
    initQuiet()
    val rows = Selection.zipfSlope(spark, sf).collect()
    assert(rows.nonEmpty)
    val vocab = graft.Tables.load(spark, sf, "documents")
      .select(col("source"), explode(split(lower(col("text")), " ")).as("w"))
      .groupBy("source").agg(countDistinct(col("w")).as("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Double]("zipf_slope") < 0.0,
        s"non-falling spectrum for ${r.getString(0)}")
      assert(r.getAs[Long]("n_ranks") ===
        math.min(100L, vocab(r.getString(0))))
      assert(r.getAs[Long]("top_freq") > 0L)
    }
  }

  test("ngramContainment: shared counts symmetric; containment bounded") {
    initQuiet()
    val rows = Selection.ngramContainment(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getAs[Long]("shared"), r.getAs[Long]("n_grams_a"),
          r.getAs[Double]("containment")))).toMap
    assert(rows.nonEmpty)
    rows.foreach { case ((a, b), (shared, nA, cont)) =>
      assert(a != b)
      assert(shared <= nA)
      assert(cont >= 0.0 && cont <= 1.0)
      // intersection is symmetric even though containment is not
      assert(rows((b, a))._1 === shared, s"asym shared for ($a,$b)")
    }
  }

  test("hubness: buckets partition the sample; bucket bounds respected") {
    initQuiet()
    val rows = Selection.hubness(spark, sf).collect()
    val n = math.min(1000L,
      graft.Tables.load(spark, sf, "embeddings").count())
    assert(rows.map(_.getAs[Long]("n_vectors")).sum === n)
    assert(math.abs(rows.map(_.getAs[Double]("occ_share")).sum - 1.0) < 1e-3)
    val bounds = Map("0" -> (0L, 0L), "1-2" -> (1L, 2L), "3-5" -> (3L, 5L),
      "6-10" -> (6L, 10L), "11+" -> (11L, Long.MaxValue))
    rows.foreach { r =>
      val (lo, hi) = bounds(r.getString(0))
      val m = r.getAs[Long]("max_occ")
      assert(m >= lo && m <= hi, s"bucket ${r.getString(0)} max_occ $m")
    }
  }

  test("kAnonymity: risky mass equals the direct class-size count") {
    initQuiet()
    val rows = Selection.kAnonymity(spark, sf).collect()
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("lang"), expr("n_chars DIV 50").as("b"))
    val direct = docs.groupBy("lang", "b").count()
      .filter(col("count") < 5)
      .agg(sum(col("count"))).collect().head
    val expected = if (direct.isNullAt(0)) 0L else direct.getLong(0)
    assert(rows.map(_.getAs[Long]("n_risky")).sum === expected)
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs.count())
    rows.foreach { r =>
      val s = r.getAs[Double]("risky_share")
      assert(s >= 0.0 && s <= 1.0)
    }
  }

  test("dsir-style rank cut: groupedCumSum rank equals row_number " +
    "over (weight desc, id) on an adversarial tie-heavy frame") {
    initQuiet()
    import spark.implicits._
    // many repeated weights (ties broken by id) across 3 groups — the
    // shape where a block-boundary bug in the cumulative rank would show
    val df = (1 to 300).map { i =>
      (s"g${i % 3}", i.toLong, ((i * 7919) % 13).toLong)
    }.toDF("source", "doc_id", "wgt")
      .withColumn("__negw", -col("wgt"))
      .withColumn("__one", lit(1L))
    val viaCum = Concentration
      .groupedCumSum(df, "source", "__negw", "doc_id", "__one")
      .filter(expr(
        "CAST(__cumw AS BIGINT) <= (CAST(__wtot AS BIGINT) + 3) DIV 4"))
      .select(col("source"), col("doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val w = Window.partitionBy(col("source"))
      .orderBy(col("wgt").desc, col("doc_id"))
    val viaWindow = df
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("source"))))
      .filter(expr("rn <= (n + 3) DIV 4"))
      .select(col("source"), col("doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(viaCum === viaWindow)
  }
}
