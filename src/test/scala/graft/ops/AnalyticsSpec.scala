package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def mkTs(s: Long) = new java.sql.Timestamp(s * 1000)

  test("movingAgg: trailing 1h average matches hand computation") {
    val df = Seq(
      (1L, mkTs(0), 10.0), (1L, mkTs(1800), 20.0), (1L, mkTs(3600), 30.0),
      (1L, mkTs(7300), 40.0), (2L, mkTs(0), 100.0)).toDF("uid", "ts", "v")
    val out = Analytics.movingAgg(df, "uid", "ts", "v", 3600)
      .orderBy("uid", "ts").collect()
    val avgs = out.map(_.getDouble(3))
    assert(avgs(0) == 10.0)          // [10]
    assert(avgs(1) == 15.0)          // [10,20]
    assert(avgs(2) == 20.0)          // [10,20,30] (0 is within 3600 incl.)
    assert(avgs(3) == 40.0)          // 7300-3600=3700 > 3600 → alone
    assert(avgs(4) == 100.0)         // other user isolated
  }

  test("rollingRows: 3-row window") {
    val df = Seq((1L, 1, 1.0), (1L, 2, 2.0), (1L, 3, 3.0), (1L, 4, 6.0))
      .toDF("uid", "seq", "v")
    val out = Analytics.rollingRows(df, "uid", "seq", "v", 3)
      .orderBy("seq").collect().map(_.getDouble(3))
    assert(out.toSeq == Seq(1.0, 1.5, 2.0, 11.0 / 3))
  }

  test("approxQuantiles tracks exact percentiles within rank error") {
    val events = graft.Tables.load(spark, sf, "events")
    val approx = Analytics.approxQuantiles(
        events, Seq("event_type"), "value", Seq(0.5, 0.95))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val exact = events.groupBy("event_type")
      .agg(expr("percentile(value, array(0.5, 0.95))").as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    exact.foreach { case (k, ex) =>
      approx(k).zip(ex).foreach { case (a, e) =>
        assert(math.abs(a - e) <= math.max(0.05 * math.abs(e), 1.0),
          s"$k: approx=$a exact=$e")
      }
    }
  }

  test("thetaJoin handles arbitrary inequality conditions") {
    val l = Seq((1, 10), (2, 20)).toDF("id", "lo")
    val r = Seq((100, 15), (200, 25)).toDF("rid", "x")
    val out = Analytics.thetaJoin(l, r, col("x") > col("lo") && col("x") < col("lo") + 10)
    assert(out.collect().map(r => (r.getInt(0), r.getInt(2))).toSet == Set((1, 100), (2, 200)))
  }

  test("bandJoin equals naive theta join on |dt| <= band") {
    val events = graft.Tables.load(spark, sf, "events").limit(300)
    val l = events.select(col("user_id"), col("ts").as("lts"))
    val r = events.select(col("user_id"), col("ts").as("rts"))
    val banded = Analytics.bandJoin(l, r, Seq("user_id"), "lts", "rts", 600)
      .select("user_id", "lts", "rts").collect().toSet
    val naive = l.join(r, "user_id")
      .filter(abs(unix_micros(col("lts")) - unix_micros(col("rts"))) <= 600L * 1000000L)
      .select("user_id", "lts", "rts").collect().toSet
    assert(banded == naive)
  }

  test("robustOutliers: median/MAD/count match driver-side computation") {
    // group a: values 1..9 plus one wild outlier; group b: symmetric, no outliers
    val a = Seq(1.0, 2, 3, 4, 5, 6, 7, 8, 9, 1000)
    val b = Seq(10.0, 20, 30)
    val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "v")
    def medianOf(xs: Seq[Double]) = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val out = Analytics.robustOutliers(df, Seq("g"), "v").orderBy(col("g"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
    for (((g, xs), i) <- Seq(("a", a), ("b", b)).zipWithIndex) {
      val med = medianOf(xs)
      val mad = medianOf(xs.map(x => math.abs(x - med)))
      val nOut = xs.count(x => math.abs(x - med) > 3 * mad)
      assert(out(i) == ((g, med, mad, nOut.toLong, xs.size.toLong)))
    }
    assert(out(0)._4 == 1L && out(1)._4 == 0L)
  }

  test("rollingActiveUsers: trailing windows match hand computation") {
    // day 1: u1,u2; day 2: u2; day 4: u3. 2-day window:
    //   d1: {u1,u2}=2, d2: {u1,u2}=2, d4: {u3}=1 (d3 not observed -> absent)
    val df = Seq(
      ("2024-01-01 10:00:00", 1L), ("2024-01-01 11:00:00", 2L),
      ("2024-01-02 09:00:00", 2L), ("2024-01-04 08:00:00", 3L)
    ).toDF("ts_s", "u").select(col("ts_s").cast("timestamp").as("ts"), col("u"))
    val got = Analytics.rollingActiveUsers(df, "u", "ts", Seq(2))
      .orderBy(col("d"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("2024-01-01", 2L, 2L),
      ("2024-01-02", 1L, 2L),
      ("2024-01-04", 1L, 1L)))
  }
}
