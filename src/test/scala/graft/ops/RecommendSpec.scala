package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computable pins for item-item collaborative filtering (q126). */
class RecommendSpec extends SparkSpec {

  import spark.implicits._

  test("itemCosine: exact integer dot/norms, closed-form cosine") {
    initQuiet()
    // entity 1: A=2, B=1 ; entity 2: A=1, B=3 ; entity 3: A=4 only
    // dot(A,B) = 2·1 + 1·3 = 5 ; |A|² = 4+1+16 = 21 ; |B|² = 1+9 = 10
    // cos = 5/√210 = 0.345033
    val df = Seq((1L, "A", 2L), (1L, "B", 1L), (2L, "A", 1L), (2L, "B", 3L),
      (3L, "A", 4L)).toDF("e", "i", "n")
    val out = Recommend.itemCosine(df, "e", "i", "n").collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getString(0), r.getString(1)) == (("A", "B")))
    assert(r.getLong(2) == 2L) // n_common
    assert(r.getLong(3) == 5L) // dot
    assert(r.getDouble(4) == math.rint(5.0 / math.sqrt(21.0 * 10.0) * 1e6) / 1e6)
  }

  test("itemCosine: support floor drops thin pairs") {
    initQuiet()
    val df = Seq((1L, "A", 1L), (1L, "B", 1L), (2L, "A", 1L), (2L, "C", 1L),
      (3L, "A", 1L), (3L, "C", 1L)).toDF("e", "i", "n")
    val out = Recommend.itemCosine(df, "e", "i", "n", minEntities = 2L)
      .collect()
    assert(out.length == 1) // only (A,C) has 2 common entities
    assert((out.head.getString(0), out.head.getString(1)) == (("A", "C")))
  }

  test("q126 runs end-to-end on the corpus with bounded output") {
    initQuiet()
    val out = Recommend.itemCfQuery(spark, sf).collect()
    assert(out.length <= 50 && out.nonEmpty)
    assert(out.forall(r => r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0))
  }

  test("rrfQuery: scores reproduce 1/(60+r) terms and descend") {
    initQuiet()
    val rows = Recommend.rrfQuery(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val (r1, r2) = (r.getInt(1), r.getInt(2))
      val expect = (if (r1 > 0) 1.0 / (60 + r1) else 0.0) +
        (if (r2 > 0) 1.0 / (60 + r2) else 0.0)
      assert(math.abs(r.getDouble(3) - expect) < 1e-6)
    }
    val scores = rows.map(_.getDouble(3))
    assert(scores.sameElements(scores.sortBy(-(_: Double))))
  }
  test("coverageQuery: covered <= parts; top1_share and coverage in (0,1]") {
    initQuiet()
    val rows = Recommend.coverageQuery(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_covered") <= r.getAs[Long]("n_parts"))
      val cov = r.getAs[Double]("coverage")
      assert(cov > 0.0 && cov <= 1.0)
      assert(r.getAs[Double]("top1_share") > 0.0)
    }
  }

  test("wilsonQuery: lower bound strictly inside (0, rate); shrinkage real") {
    initQuiet()
    val rows = Recommend.wilsonQuery(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rate, lb) = (r.getAs[Double]("repeat_rate"),
        r.getAs[Double]("wilson_lb"))
      assert(lb >= 0.0 && lb <= 1.0)
      if (r.getAs[Long]("n_repeat") > 0) assert(lb < rate + 1e-9)
      assert(r.getAs[Long]("n_repeat") <= r.getAs[Long]("n_buyers"))
    }
    // replicate the closed form on one row
    val r0 = rows.head
    val n = r0.getAs[Long]("n_buyers").toDouble
    val p = r0.getAs[Long]("n_repeat").toDouble / n
    val z = 1.96
    val lb = (p + z * z / (2 * n) -
      z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))) / (1 + z * z / n)
    assert(math.abs(r0.getAs[Double]("wilson_lb") - lb) < 1e-5)
  }

  test("ebShrinkQuery: shrunk rates sit strictly between raw and prior") {
    initQuiet()
    val rows = Recommend.ebShrinkQuery(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.filterNot(_.isNullAt(5)).foreach { r =>
      val (raw, m, s) = (r.getAs[Double]("raw_rate"),
        r.getAs[Double]("prior_mean"), r.getAs[Double]("shrunk_rate"))
      // convex combination: between raw and prior, closer to prior
      // than raw is (|s - m| <= |raw - m|)
      assert(s >= math.min(raw, m) - 1e-6 && s <= math.max(raw, m) + 1e-6)
      assert(math.abs(s - m) <= math.abs(raw - m) + 1e-6)
    }
  }
}
