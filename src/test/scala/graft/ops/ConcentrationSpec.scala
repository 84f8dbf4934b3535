package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computable pins for the concentration/coverage family
  * (q121–q124). */
class ConcentrationSpec extends SparkSpec {

  import spark.implicits._

  test("gini: perfect equality is 0; one-takes-all approaches (n-1)/n") {
    initQuiet()
    val eq = (1 to 4).map(i => ("e", i.toLong, 100L)).toDF("k", "id", "v")
    val g1 = Concentration.gini(eq, "k", "v", "id").collect().head
    assert(g1.getLong(1) == 4L)
    assert(g1.getDouble(2) == 0.0)
    // [0,0,0,100]: ranks 1..4, Σx=100, Σrx=400 → (800-500)/400 = 0.75
    val uneq = Seq(("u", 1L, 0L), ("u", 2L, 0L), ("u", 3L, 0L), ("u", 4L, 100L))
      .toDF("k", "id", "v")
    assert(Concentration.gini(uneq, "k", "v", "id")
      .collect().head.getDouble(2) == 0.75)
  }

  test("pareto: exact integer crossing at 4/5") {
    initQuiet()
    // values 50,30,10,10 (total 100): cum 50,80,90,100 — 80·5 ≥ 100·4
    // exactly at k=2; share_at_k = 0.8. (Group col deliberately NOT
    // named "k": the output carries a "k" column of its own.)
    val df = Seq(("p", 1L, 50L), ("p", 2L, 30L), ("p", 3L, 10L), ("p", 4L, 10L))
      .toDF("g", "id", "v")
    val r = Concentration.paretoThreshold(df, "g", "v", "id", 4, 5)
      .collect().head
    assert(r.getLong(1) == 4L)   // n
    assert(r.getInt(2) == 2)     // k
    assert(r.getDouble(3) == 0.5) // frac
    assert(r.getDouble(4) == 0.8) // share
  }

  test("cr-k: ties on value break on the tie column deterministically") {
    initQuiet()
    // values 40,40,10,10 with k=2: top-2 = 80/100 whichever tie order,
    // but the ROWS cut must still be deterministic — pin cr2 = 0.8
    val df = Seq(("c", 1L, 40L), ("c", 2L, 40L), ("c", 3L, 10L), ("c", 4L, 10L))
      .toDF("k", "id", "v")
    val r = Concentration.concentrationRatio(df, "k", "v", "id", 2)
      .collect().head
    assert(r.getLong(1) == 4L)
    assert(r.getDouble(2) == 0.8)
  }

  test("oov: tokens outside the top-N vocabulary are counted per group") {
    initQuiet()
    // corpus tokens: 'a'×4, 'b'×3, 'c'×1 → vocab(2) = {a, b}; group g2
    // holds the only 'c' → oov 1/3
    val df = Seq(("g1", "a a b"), ("g1", "a b"), ("g2", "a b c"))
      .toDF("src", "text")
    val out = Concentration.oovRates(df, "src", "text", vocabSize = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("g1") == ((5L, 0L, 0.0)))
    assert(out("g2") == ((3L, 1L, 0.333333)))
  }

  test("oov: vocabulary tiebreak is (count desc, token asc)") {
    initQuiet()
    // 'x' and 'y' both appear twice; vocab(1) must pick 'x' (asc tie)
    val df = Seq(("g", "x y"), ("g", "y x")).toDF("src", "text")
    val out = Concentration.oovRates(df, "src", "text", vocabSize = 1)
      .collect().head
    assert(out.getLong(1) == 4L)
    assert(out.getLong(2) == 2L) // both 'y' occurrences are OOV
  }

  test("quality curve: monotone non-increasing retention, t=0 keeps all") {
    initQuiet()
    val out = Concentration.qualityCurveQuery(spark, sf)
      .collect().map(r => r.getDouble(0) -> (r.getLong(1), r.getDouble(3)))
    assert(out.nonEmpty)
    assert(out.head._1 == 0.0 && out.head._2._2 == 1.0) // t=0 keeps everything
    // retention can only fall as the bar rises
    out.map(_._2._1).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a >= b); case _ => ()
    }
  }

  test("readability: integer word/vowel-group counts, closed-form Flesch") {
    initQuiet()
    // "data data": 2 words, 4 vowel groups (d-a-t-a twice) →
    // flesch = 206.835 − 1.015·2 − 84.6·2 = 35.605
    val df = Seq(("s", "data data")).toDF("g", "t")
    val r = Concentration.readability(df, "g", "t").collect().head
    assert(r.getLong(1) == 1 && r.getLong(2) == 2 && r.getLong(3) == 4)
    assert(r.getDouble(6) == 35.605)
  }

  test("lexical diversity: ttr and within-group hapax share") {
    initQuiet()
    // tokens a,b,a: total 3, distinct 2, hapax {b} → ttr 2/3, share 1/2
    val df = Seq(("s", "a b a")).toDF("g", "t")
    val r = Concentration.lexicalDiversity(df, "g", "t").collect().head
    assert(r.getLong(1) == 3 && r.getLong(2) == 2 && r.getLong(3) == 1)
    assert(r.getDouble(4) == 0.666667 && r.getDouble(5) == 0.5)
  }

  test("q121-q124 run end-to-end on the corpus") {
    initQuiet()
    assert(Concentration.giniQuery(spark, sf).count() == 5)
    assert(Concentration.paretoQuery(spark, sf).count() == 5)
    assert(Concentration.cr4Query(spark, sf).count() > 0)
    val oov = Concentration.oovQuery(spark, sf).collect()
    assert(oov.nonEmpty && oov.forall(r => r.getDouble(3) >= 0 && r.getDouble(3) <= 1))
  }

  test("equiDepthHistogram: standard ntile remainder rule; exact bounds") {
    initQuiet()
    // 5 rows into 2 buckets: bucket 1 gets 3 (remainder first), with
    // contiguous non-overlapping [lo, hi] under the total order
    val df = Seq(10L, 20L, 30L, 40L, 50L).zipWithIndex
      .map { case (v, i) => ("g", v, i.toLong) }.toDF("k", "v", "id")
    val out = Concentration.equiDepthHistogram(df, "k", "v", "id", 2)
      .orderBy("bucket").collect()
    assert(out.map(_.getInt(1)).toSeq == Seq(1, 2))
    assert(out.map(_.getLong(2)).toSeq == Seq(3L, 2L))
    assert(out.map(r => (r.getLong(3), r.getLong(4))).toSeq ==
      Seq((10L, 30L), (40L, 50L)))
  }

  test("lorenzDeciles: shares sum to 1; cum_share monotone; uniform flat") {
    initQuiet()
    // 10 equal-value entities: every decile carries share 0.1
    val flat = (1 to 10).map(i => ("g", 100L, i.toLong)).toDF("k", "v", "id")
    val fr = Concentration.lorenzDeciles(flat, "k", "v", "id")
      .orderBy("decile").collect()
    assert(fr.length == 10 && fr.forall(_.getDouble(3) == 0.1))
    assert(fr.last.getDouble(4) == 1.0)
    // skewed: one whale holds 91/100 of value -> top decile share 0.91,
    // cum_share strictly ascending to exactly 1.0
    val skew = ((1 to 9).map(i => ("g", 1L, i.toLong)) :+ ("g", 91L, 10L))
      .toDF("k", "v", "id")
    val sr = Concentration.lorenzDeciles(skew, "k", "v", "id")
      .orderBy("decile").collect()
    assert(sr.last.getDouble(3) == 0.91)
    assert(sr.map(_.getDouble(4)).toSeq == sr.map(_.getDouble(4)).toSeq.sorted)
    assert(sr.last.getDouble(4) == 1.0)
  }

  test("q146/q147: segment-decile grids on the corpus") {
    initQuiet()
    val ed = Concentration.equiDepthQuery(spark, sf).collect()
    assert(ed.length == 50) // 5 segments x 10 buckets
    assert(ed.forall(r => r.getDouble(3) <= r.getDouble(4)))
    val lz = Concentration.lorenzQuery(spark, sf).collect()
    assert(lz.length == 50)
    assert(lz.filter(_.getInt(1) == 10).forall(_.getDouble(4) == 1.0))
  }

  test("skylineQuery: window formulation equals brute-force dominance") {
    initQuiet()
    val metrics = graft.Tables.load(spark, sf, "lineitem")
      .groupBy(col("l_suppkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("x"),
        countDistinct(col("l_partkey")).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = metrics.filter { case (_, x, y) =>
      !metrics.exists { case (_, bx, by) =>
        bx >= x && by >= y && (bx > x || by > y)
      }
    }.map(_._1).toSet
    val got = Concentration.skylineQuery(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(got == brute && got.nonEmpty)
  }

  test("nucleusVocabQuery: boundary token included, coverage >= 0.9, nucleus <= vocab") {
    initQuiet()
    val rows = Concentration.nucleusVocabQuery(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (vocab, nucleus) = (r.getAs[Long]("vocab_size"), r.getAs[Long]("nucleus_size"))
      assert(nucleus >= 1 && nucleus <= vocab)
      // smallest covering prefix: coverage crosses 0.9 BECAUSE the
      // boundary token is in, so it can't be below 0.9
      assert(r.getAs[Double]("nucleus_coverage") >= 0.9)
    }
  }

  test("zipfQuery: natural-ish corpus slopes are negative with high R2") {
    initQuiet()
    val rows = Concentration.zipfQuery(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("zipf_slope") < 0.0)
      val r2 = r.getAs[Double]("r2")
      assert(r2 > 0.0 && r2 <= 1.0)
    }
  }

  test("hhiQuery: HHI within [1/n, 1]; effective suppliers <= n") {
    initQuiet()
    val rows = Concentration.hhiQuery(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_suppliers")
      val hhi = r.getAs[Double]("hhi")
      assert(hhi >= 1.0 / n - 1e-6 && hhi <= 1.0)
      assert(r.getAs[Double]("effective_suppliers") <= n + 1e-6)
      val top = r.getAs[Double]("top_share")
      // top share bounds HHI: top^2 <= HHI <= top
      assert(hhi >= top * top - 1e-6 && hhi <= top + 1e-6)
    }
  }

  test("abcQuery: shares partition to 1; class cuts respect 80/95 bounds") {
    initQuiet()
    val rows = Concentration.abcQuery(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      assert(math.abs(g.map(_.getAs[Double]("rev_share")).sum - 1.0) < 1e-4)
      val byClass = g.map(r => r.getString(1) -> r.getAs[Double]("rev_share"))
        .toMap
      // cumulative-share cuts: A mass <= 80%, A+B mass <= 95%
      assert(byClass.getOrElse("A", 0.0) <= 0.8 + 1e-9)
      assert(byClass.getOrElse("A", 0.0) +
        byClass.getOrElse("B", 0.0) <= 0.95 + 1e-9)
      // C always exists (the crossing part itself lands in C's band
      // only when cum > 95%; the LAST part always has cum = tot > 95%)
      assert(byClass.contains("C"))
    }
  }

  test("fertilityQuery: percentiles ordered; corpus ratio at least 1") {
    initQuiet()
    val rows = Concentration.fertilityQuery(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p50, p90) = (r.getAs[Double]("p50_fertility"),
        r.getAs[Double]("p90_fertility"))
      assert(p50 <= p90 + 1e-9)
      // every space-separated token costs >= 1 char plus separators
      assert(r.getAs[Double]("chars_per_token") >= 1.0)
      assert(r.getAs[Long]("n_docs") > 0)
    }
  }

  test("burstyTermsQuery: burstiness >= 1; support floor respected") {
    initQuiet()
    val rows = Concentration.burstyTermsQuery(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("df") >= 20L)
      assert(r.getAs[Long]("cf") >= r.getAs[Long]("df"))
      assert(r.getAs[Double]("burstiness") >= 1.0)
    }
    // descending by burstiness
    val bs = rows.map(_.getAs[Double]("burstiness"))
    bs.sliding(2).foreach {
      case Array(a, b) => assert(a >= b)
      case _ =>
    }
  }

  test("priceDispersionQuery: flags consistent with the 5% CV cut") {
    initQuiet()
    val rows = Concentration.priceDispersionQuery(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dispersed") <= r.getAs[Long]("n_parts"))
      val share = r.getAs[Double]("dispersed_share")
      assert(share >= 0.0 && share <= 1.0)
      assert(r.getAs[Double]("mean_cv") >= 0.0)
    }
  }

  test("chao1Query: richness >= observed; unseen mass in (0, 1)") {
    initQuiet()
    val rows = Concentration.chao1Query(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("chao1_richness") >=
        r.getAs[Long]("v_observed").toDouble - 1e-9)
      val u = r.getAs[Double]("unseen_mass")
      assert(u >= 0.0 && u < 1.0)
      assert(r.getAs[Long]("n_hapax") <= r.getAs[Long]("v_observed"))
    }
  }

  test("theilQuery: within contributions + between terms = global Theil") {
    initQuiet()
    val rows = Concentration.theilQuery(spark, sf).collect()
    assert(rows.nonEmpty)
    val decomposed = rows.map(r => r.getAs[Double]("within_contribution") +
      r.getAs[Double]("between_term")).sum
    // direct global Theil: sum (x/S) * ln(x/mu) over ALL customers
    val perCust = graft.Tables.load(spark, sf, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("x"))
      .select(col("x").cast("double")).collect().map(_.getDouble(0))
    val s = perCust.sum; val mu = s / perCust.length
    val direct = perCust.map(x => (x / s) * math.log(x / mu)).sum
    // each nation's two terms are rounded to 6dp -> <= 50e-6 slack
    assert(math.abs(decomposed - direct) < 1e-4,
      s"decomposed=$decomposed direct=$direct")
    // spend shares partition the total
    assert(math.abs(rows.map(_.getAs[Double]("spend_share")).sum - 1.0) < 1e-4)
  }

  test("shareOfParentQuery: shares sum to 1 within region and overall") {
    initQuiet()
    val rows = Concentration.shareOfParentQuery(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      assert(math.abs(g.map(_.getDouble(3)).sum - 1.0) < 1e-4)
    }
    val regionShares = rows.map(r => r.getString(0) -> r.getDouble(4))
      .distinct.map(_._2)
    assert(math.abs(regionShares.sum - 1.0) < 1e-4)
  }

  test("groupedCumSum: equals the single-window prefix sum, any blocking") {
    initQuiet()
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("nt"))
      .withColumn("ord", -col("nt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("ord"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val expect = docs.withColumn("cum", sum(col("nt")).over(w))
      .select(col("doc_id"), col("cum").cast("decimal(38,0)"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    for (blocks <- Seq(1, 7, 256)) {
      val got = Concentration.groupedCumSum(
        docs, "source", "ord", "doc_id", "nt", blocks)
        .select(col("doc_id"), col("__cumw"))
        .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
      assert(got === expect, s"blocks=$blocks")
    }
  }
}
