package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computable pins for the time-series family (q102–q104). */
class TimeSeriesSpec extends SparkSpec {

  import spark.implicits._

  test("twap: holding-duration weights, not per-observation means") {
    initQuiet()
    // value 10 held for 3s, value 20 held for 1s, last obs (30) holds nothing:
    // twap = (10*3 + 20*1) / 4 = 12.5 ; a plain mean would say 20
    val df = Seq((1L, 0L, 1L, 10.0), (1L, 3L, 2L, 20.0), (1L, 4L, 3L, 30.0))
      .toDF("k", "sec", "id", "v")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("id"), col("v"))
    val out = TimeSeries.twap(df, Seq("k"), "ts", "id", "v").collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == 3L)          // n_obs
    assert(out.head.getLong(2) == 4000000L)    // span_us
    assert(out.head.getDouble(3) == 12.5)
  }

  test("twap: single-observation and all-simultaneous series are dropped") {
    initQuiet()
    val df = Seq((1L, 5L, 1L, 10.0), (2L, 7L, 2L, 1.0), (2L, 7L, 3L, 2.0))
      .toDF("k", "sec", "id", "v")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("id"), col("v"))
    assert(TimeSeries.twap(df, Seq("k"), "ts", "id", "v").count() == 0)
  }

  test("ewma: a constant series smooths to itself; a spike decays geometrically") {
    initQuiet()
    def d(i: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i))
    val const = (0 until 10).map(i => ("c", d(i), 5.0))
    val spike = Seq(("s", d(0), 100.0), ("s", d(7), 0.0))
    val df = (const ++ spike).toDF("k", "day", "v")
    val out = TimeSeries.ewma(df, Seq("k"), "day", "v", halflifeDays = 7.0, lookback = 30)
      .collect().map(r => (r.getString(0), r.getDate(1).toString) -> r.getDouble(2)).toMap
    (0 until 10).foreach(i => assert(out(("c", d(i).toString)) == 5.0))
    assert(out(("s", d(0).toString)) == 100.0)
    // at day 7 (one half-life later): (0.5*100 + 1*0) / 1.5 = 33.333333
    assert(math.abs(out(("s", d(7).toString)) - 33.333333) < 1e-6)
  }

  test("interpolate: gap midpoints are linear; leading/trailing gaps stay null") {
    initQuiet()
    // grid at t=0..4s: values 10, null, null, 40, null -> t1=20, t2=30; t4 null
    val df = Seq((1L, 0L, Some(10.0)), (1L, 1L, None), (1L, 2L, None),
      (1L, 3L, Some(40.0)), (1L, 4L, None))
      .toDF("k", "sec", "v")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("v"))
    val out = TimeSeries.interpolate(df, Seq("k"), "ts", "v")
      .orderBy("ts").select("__filled").collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSeq == Seq(Some(10.0), Some(20.0), Some(30.0), Some(40.0), None))
  }

  test("shipLagQuery: one row per priority, ordered percentiles") {
    initQuiet()
    val out = TimeSeries.shipLagQuery(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getDouble(3) <= r.getDouble(4))       // p50 <= p90
      assert(r.getDouble(4) <= r.getInt(5).toDouble) // p90 <= max
    }
  }

  test("drawdownQuery: drawdown in [0,1]; a peak month has zero drawdown") {
    initQuiet()
    val out = TimeSeries.drawdownQuery(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val dd = r.getAs[Double]("max_drawdown")
      assert(dd >= 0.0 && dd < 1.0)
      assert(r.getAs[Long]("n_months") > 1)
    }
  }

  test("kendall: a strictly increasing series has tau_b = 1, decreasing = -1") {
    initQuiet()
    // pin the pair arithmetic on hand-built series through the same
    // groupBy shape the query uses (inline replica over a tiny frame)
    val m = Seq(("UP", 1, 10L), ("UP", 2, 20L), ("UP", 3, 30L),
      ("DOWN", 1, 30L), ("DOWN", 2, 20L), ("DOWN", 3, 10L),
      ("TIE", 1, 10L), ("TIE", 2, 10L), ("TIE", 3, 20L))
      .toDF("n_name", "m", "rev_cents")
    val a = m.select(col("n_name"), col("m").as("m1"), col("rev_cents").as("r1"))
    val b = m.select(col("n_name").as("__n2"), col("m").as("m2"),
      col("rev_cents").as("r2"))
    val out = a.join(b, col("n_name") === col("__n2") && col("m1") < col("m2"))
      .groupBy(col("n_name"))
      .agg(sum(when(col("r2") > col("r1"), 1L).otherwise(0L)).as("nc"),
        sum(when(col("r2") < col("r1"), 1L).otherwise(0L)).as("nd"),
        sum(when(col("r2") === col("r1"), 1L).otherwise(0L)).as("nt"),
        count(lit(1)).as("n0"))
      .select(col("n_name"),
        ((col("nc") - col("nd")) /
          sqrt(col("n0").cast("double") * (col("n0") - col("nt")))).as("tau"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("UP") == 1.0)
    assert(out("DOWN") == -1.0)
    // TIE: nc=2 (10<20 twice), nd=0, nt=1, n0=3 → 2/sqrt(3*2) = 0.816497
    assert(math.abs(out("TIE") - 2.0 / math.sqrt(6.0)) < 1e-9)
  }

  test("holt: hand-computed two-step level and trend") {
    initQuiet()
    // series 10, 20 at alpha=.3 beta=.1:
    // step1: l=10 b=0; step2: l=.3*20+.7*10=13, b=.1*(13-10)=0.3
    val df = Seq(("e", java.sql.Date.valueOf("2024-01-01"), 10.0),
      ("e", java.sql.Date.valueOf("2024-01-02"), 20.0))
      .toDF("event_type", "day", "x")
    val lNew = "IF(a.n = 0L, x.x, 0.3D * x.x + 0.7D * (a.l + a.b))"
    val st = df.groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("day"), col("x")))).as("__s"))
      .withColumn("__st", expr(
        s"""aggregate(__s, named_struct('l', 0D, 'b', 0D, 'n', 0L),
           |  (a, x) -> named_struct(
           |    'l', $lNew,
           |    'b', IF(a.n = 0L, 0D, 0.1D * (($lNew) - a.l) + 0.9D * a.b),
           |    'n', a.n + 1L))""".stripMargin))
      .select("__st.l", "__st.b").head()
    assert(st.getDouble(0) == 13.0)
    assert(math.abs(st.getDouble(1) - 0.3) < 1e-12)
  }

  test("holtQuery: forecast is the linear level+7*trend extension") {
    initQuiet()
    val rows = TimeSeries.holtQuery(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (l, b, f) = (r.getAs[Double]("level"), r.getAs[Double]("trend"),
        r.getAs[Double]("forecast_7d"))
      assert(math.abs(f - (l + 7 * b)) < 1e-4)
      assert(r.getAs[Long]("n_days") > 0)
    }
  }

  test("kendallQuery: tau_b bounded and pair counts consistent") {
    initQuiet()
    val out = TimeSeries.kendallQuery(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nc, nd, nt) = (r.getAs[Long]("nc"), r.getAs[Long]("nd"),
        r.getAs[Long]("n_ties"))
      val tau = r.getAs[Double]("tau_b")
      assert(tau >= -1.0 && tau <= 1.0)
      assert(nc >= 0 && nd >= 0 && nt >= 0)
    }
  }

  test("integer div truncates toward zero on negatives (q206 contract)") {
    initQuiet()
    // the q206 oracle relies on Spark `div` == DuckDB `//` for the
    // NEGATIVE detrended numerators; both must truncate, never floor
    val r = spark.range(1)
      .selectExpr("(-7L) div 2L AS a", "7L div 2L AS b",
        "(-70001L) div 10000L AS c").head()
    assert(r.getLong(0) == -3L) // floor would give -4
    assert(r.getLong(1) == 3L)
    assert(r.getLong(2) == -7L) // floor would give -8
  }

  test("seasonalDecomposeQuery: residual identity; trend null only at edges") {
    initQuiet()
    val rows = TimeSeries.seasonalDecomposeQuery(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      val sorted = g.sortBy(_.getString(1))
      // centered 7-day MA: exactly the first 3 and last 3 days lack it
      val nullTrend = sorted.zipWithIndex.filter(_._1.isNullAt(3)).map(_._2)
      assert(nullTrend.toSet ==
        (0 to 2).toSet ++ (sorted.length - 3 until sorted.length).toSet)
      sorted.filterNot(_.isNullAt(3)).foreach { r =>
        val recomposed = r.getAs[Double]("trend") +
          r.getAs[Double]("seasonal") + r.getAs[Double]("residual")
        // exact by construction in 1e-4 units
        assert(math.abs(recomposed - r.getAs[Long]("n_events")) < 1e-9)
      }
    }
  }

  test("seasonalityStrengthQuery: eta squared lives in [0, 1]") {
    initQuiet()
    val rows = TimeSeries.seasonalityStrengthQuery(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val e = r.getAs[Double]("eta_sq")
      assert(e >= -1e-9 && e <= 1.0 + 1e-9, s"${r.getString(0)}: $e")
      assert(r.getAs[Long]("n_days") > 0)
    }
  }

  test("varQuery: expected shortfall never exceeds the VaR cut") {
    initQuiet()
    val rows = TimeSeries.varQuery(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // CVaR is the mean of the tail AT OR BELOW the 5th percentile
      assert(r.getAs[Double]("cvar95") <= r.getAs[Double]("var95") + 1e-9)
      assert(r.getAs[Long]("n_deltas") > 0)
    }
  }

  test("maseQuery: matches a brute-force calendar backtest per type") {
    initQuiet()
    val daily = graft.Tables.load(spark, sf, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val byKey = daily.map(t => (t._1, t._2) -> t._3).toMap
    val rows = TimeSeries.maseQuery(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { row =>
      val t = row.getString(0)
      val evals = daily.filter(_._1 == t).flatMap { case (_, d, x) =>
        for {
          x7 <- byKey.get((t, d.minusDays(7)))
          x1 <- byKey.get((t, d.minusDays(1)))
        } yield (math.abs(x - x7), math.abs(x - x1))
      }
      assert(row.getAs[Long]("n_eval") === evals.length.toLong)
      val m7 = evals.map(_._1).sum.toDouble / evals.length
      val m1 = evals.map(_._2).sum.toDouble / evals.length
      assert(math.abs(row.getAs[Double]("mae_seasonal") - m7) < 2e-4)
      assert(math.abs(row.getAs[Double]("mae_naive1") - m1) < 2e-4)
      assert(math.abs(row.getAs[Double]("mase") - m7 / m1) < 1e-2)
    }
  }

  test("deseasonalAnomalyQuery: worst day matches a brute-force z scan") {
    initQuiet()
    // recover the exact e4-unit residuals from the q206 output
    val resid = TimeSeries.seasonalDecomposeQuery(spark, sf).collect()
      .filter(!_.isNullAt(3))
      .map(r => (r.getString(0), r.getString(1),
        math.round(r.getAs[Double]("residual") * 10000)))
    val rows = TimeSeries.deseasonalAnomalyQuery(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { row =>
      val g = resid.filter(_._1 == row.getString(0))
      val n = g.length.toLong
      assert(row.getAs[Long]("n_days") === n)
      val s = g.map(_._3).sum
      // argmax |n*r - s| with day tiebreak
      val worst = g.map(t => (-(n * t._3 - s).abs, t._2)).min._2
      assert(row.getAs[String]("worst_day") === worst)
      val q = g.map(t => t._3 * t._3).sum
      val z = (n * g.find(_._2 == worst).get._3 - s) /
        math.sqrt((n * q - s * s).toDouble)
      assert(math.abs(row.getAs[Double]("worst_z") - z) < 1e-3)
    }
  }
}
