package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computable pins for the span/conformance family (q117–q120). */
class SpansSpec extends SparkSpec {

  import spark.implicits._

  private def d(i: Int) =
    java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i))

  test("streaks: islands split exactly at gaps, runs keep bounds and length") {
    initQuiet()
    // user 1: days 0,1,2, 5,6 → runs (0-2, len 3), (5-6, len 2)
    // user 2: day 9 alone → run (9-9, len 1)
    val df = (Seq(0, 1, 2, 5, 6).map(i => (1L, d(i))) :+ ((2L, d(9))))
      .toDF("u", "day")
    val out = Spans.streaks(df, "u", "day")
      .collect().map(r => (r.getLong(0), r.getDate(1).toString,
        r.getDate(2).toString, r.getLong(3))).toSet
    assert(out == Set(
      (1L, d(0).toString, d(2).toString, 3L),
      (1L, d(5).toString, d(6).toString, 2L),
      (2L, d(9).toString, d(9).toString, 1L)))
  }

  test("peak concurrency: closed intervals count at shared boundaries") {
    initQuiet()
    // bucket A: [0,10], [10,20], [15,30] → at t=10 two overlap (closed),
    // at t=15..20 two overlap → peak 2; bucket B: disjoint → peak 1
    val df = Seq(("A", 0L, 10L), ("A", 10L, 20L), ("A", 15L, 30L),
      ("B", 0L, 5L), ("B", 6L, 9L)).toDF("b", "s", "e")
    val out = Spans.peakConcurrency(df, "b", "s", "e")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("A") == ((2L, 3L)))
    assert(out("B") == ((1L, 2L)))
  }

  test("peak concurrency: instantaneous overlap of three") {
    initQuiet()
    val df = Seq(("x", 5L, 5L), ("x", 5L, 5L), ("x", 5L, 6L)).toDF("b", "s", "e")
    val out = Spans.peakConcurrency(df, "b", "s", "e").collect().head
    assert(out.getLong(1) == 3L)
  }

  test("orphanCounts: both directions") {
    initQuiet()
    val fact = Seq(1L, 1L, 2L, 9L).toDF("fk")
    val dim = Seq(1L, 2L, 3L).toDF("dk")
    val (fo, dor) = Spans.orphanCounts(fact, "fk", dim, "dk")
    assert(fo == 1L) // the 9
    assert(dor == 1L) // the 3
  }

  test("positionScores: unique tiebreak makes ranks exact") {
    initQuiet()
    // 4 rows in one group ordered (v, id): pr = 0, 1/3, 2/3, 1
    val df = Seq(("g", 1L, 10L), ("g", 2L, 10L), ("g", 3L, 20L), ("g", 4L, 30L))
      .toDF("k", "id", "v")
    val out = Spans.positionScores(df, "k", "v", "id")
      .collect().map(r => r.getLong(1) -> (r.getDouble(3), r.getDouble(4))).toMap
    assert(out(1L) == ((0.0, 0.25)))
    assert(out(2L) == ((0.333333, 0.5)))
    assert(out(3L) == ((0.666667, 0.75)))
    assert(out(4L) == ((1.0, 1.0)))
  }

  test("q117-q120 run end-to-end on the corpus") {
    initQuiet()
    assert(Spans.streakQuery(spark, sf).count() > 0)
    val conc = Spans.concurrencyQuery(spark, sf)
    assert(conc.count() > 0)
    assert(Spans.conformanceQuery(spark, sf).count() == 1)
    assert(Spans.positionQuery(spark, sf).count() > 0)
  }

  test("bounce rate: entry typing and single-event session counting") {
    initQuiet()
    val out = Spans.bounceQuery(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1)) // bounces ≤ sessions
      val rate = r.getDouble(3)
      assert(rate >= 0.0 && rate <= 1.0)
    }
    // entry types are real event types, never null (every session has
    // exactly one new-session row)
    assert(out.forall(!_.isNullAt(0)))
  }

  test("intervalUnionQuery: window islands equal brute-force day-set union") {
    initQuiet()
    val winUs = 30L * 86400 * 1000 * 1000
    // brute force: per customer, the union of [s, s+30d) as a day set
    val ivs = graft.Tables.load(spark, sf, "orders")
      .select(col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val dayUs = 86400L * 1000 * 1000
    val bruteCov = ivs.groupBy(_._1).map { case (k, g) =>
      k -> g.flatMap { case (_, s) =>
        (s / dayUs) until ((s + winUs) / dayUs)
      }.distinct.length.toLong * dayUs
    }
    val perCustTotal = bruteCov.values.sum
    // engine total covered µs recomputed from the nation aggregate
    val rows = Spans.intervalUnionQuery(spark, sf).collect()
    val engineTotal = rows.map(r =>
      math.round(r.getDouble(3) * r.getLong(1) * 86400000000.0 /
        1.0)).sum
    // mean_covered_days rounds to 4 decimals -> compare within rounding
    assert(math.abs(engineTotal - perCustTotal).toDouble /
      perCustTotal < 1e-6)
  }

  test("upStreakQuery: matches a brute-force run scan per nation") {
    initQuiet()
    import org.apache.spark.sql.functions._
    val daily = graft.Tables.load(spark, sf, "orders")
      .join(graft.Tables.load(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(graft.Tables.load(spark, sf, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("c"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val rows = Spans.upStreakQuery(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { row =>
      val series = daily.filter(_._1 == row.getString(0)).sortBy(_._2)
      var best = 0L; var cur = 0L
      series.sliding(2).foreach {
        case Array(a, b) =>
          cur = if (b._3 > a._3) cur + 1 else 0
          best = math.max(best, cur)
        case _ =>
      }
      assert(row.getAs[Long]("longest_up_streak") === best,
        s"${row.getString(0)}: engine ${row.getLong(2)} vs brute $best")
    }
  }
}
