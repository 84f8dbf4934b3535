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
}
