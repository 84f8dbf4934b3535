package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Pins for [[StreamingOps.trendingTopK]]: the space-saving guarantees
  * (over-estimate bounded by err; heavy hitters can never be evicted)
  * against exact batch counts, under a capacity chosen well BELOW the
  * per-window item cardinality so eviction actually happens.
  */
class TrendingSpec extends SparkSpec {

  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("trendingTopK: space-saving bounds hold vs exact batch counts under eviction") {
    initQuiet()
    // the sf0.001 corpus has 15 distinct users; capacity 8 under DAILY
    // windows (~33 events each, every window >8 distinct users) forces
    // eviction in every window, while users with count > n/8 (~40
    // (window,user) pairs corpus-wide) are guaranteed-tracked
    val base = Tables.load(spark, sf, "events")
      .select(col("ts"), concat(lit("u"), col("user_id")).as("item"))
    val rows = base.select(col("ts"), col("item"))
      .as[(java.sql.Timestamp, String)].collect().sortBy(_._1.getTime)
    val maxTs = rows.map(_._1.getTime).max

    val ms = MemoryStream[(java.sql.Timestamp, String)]
    val capacity = 8
    val out = StreamingOps.trendingTopK(
      ms.toDF().toDF("ts", "item"),
      itemCol = "item", tsCol = "ts", windowMinutes = 1440,
      capacity = capacity, k = capacity, watermark = "1 hour")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("trending").start()
    ms.addData(rows.toIndexedSeq)
    q.processAllAvailable()
    // sentinel far past every window + watermark: flushes all real windows
    ms.addData(Seq((new java.sql.Timestamp(maxTs + 96L * 3600 * 1000), "sentinel")))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("trending")
      .filter(col("item") =!= "sentinel")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got.nonEmpty, "no windows emitted")

    // exact truth per (window, item) and per-window totals
    val winUs = 1440L * 60 * 1000000L
    val exact = base
      .select(expr(s"(unix_micros(ts) div ${winUs}L) * ${winUs}L").as("w"), col("item"))
      .groupBy("w", "item").count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val totals = exact.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }

    // every emitted window carries the exact window row count
    got.groupBy(_._1._1).foreach { case (w, cells) =>
      val ns = cells.values.map(_._3).toSet
      assert(ns == Set(totals(w)), s"window $w: n ${ns} != ${totals(w)}")
    }
    // est >= true >= est - err for every emitted cell
    got.foreach { case ((w, item), (est, err, _)) =>
      val t = exact.getOrElse((w, item), 0L)
      assert(est >= t && t >= est - err, s"bounds violated for ($w,$item): est=$est err=$err true=$t")
    }
    // any item with true count > n/capacity is present (cannot be evicted)
    var guaranteed = 0
    exact.foreach { case ((w, item), t) =>
      if (t > totals(w) / capacity) {
        assert(got.contains((w, item)), s"heavy hitter evicted: ($w,$item) true=$t")
        guaranteed += 1
      }
    }
    assert(guaranteed > 0, "fixture exercised no guaranteed heavy hitters")
    // eviction actually happened somewhere (capacity < cardinality)
    assert(got.groupBy(_._1._1).exists(_._2.exists(_._2._2 > 0)),
      "no cell carries a nonzero error: capacity never saturated, test is vacuous")
  }

  test("trendingTopK: k truncates the emission, top items first") {
    initQuiet()
    val ms = MemoryStream[(java.sql.Timestamp, String)]
    def t(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
    val data = Seq.fill(5)((t(0), "a")) ++ Seq.fill(3)((t(1), "b")) ++
      Seq((t(2), "c")) ++ Seq((t(3), "d"))
    val out = StreamingOps.trendingTopK(
      ms.toDF().toDF("ts", "item"), itemCol = "item", tsCol = "ts",
      windowMinutes = 60, capacity = 10, k = 2, watermark = "0 seconds")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("trending_k").start()
    ms.addData(data)
    q.processAllAvailable()
    ms.addData(Seq((t(100000), "sentinel")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("trending_k").filter(col("item") =!= "sentinel")
      .orderBy(col("est_count").desc).collect()
    assert(got.length == 2)
    assert(got.map(_.getString(1)).toSeq == Seq("a", "b"))
    assert(got.map(_.getLong(2)).toSeq == Seq(5L, 3L))
  }
}
