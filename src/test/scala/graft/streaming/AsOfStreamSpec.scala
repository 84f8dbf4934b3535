package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream as-of enrichment (VERDICT r6 §next-round #9): the
  * streaming twin of q83's point-in-time join. Semantics pinned on a
  * hand fixture; stream-batch equivalence pinned against a batch
  * as-of reference over the real events table.
  */
class AsOfStreamSpec extends SparkSpec {

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("as-of stream: inclusive boundary, band cutoff, unmatched facts, out-of-order dims") {
    initQuiet()
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val fms = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val dms = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = StreamingOps.asOfEnrichStream(
      fms.toDF.toDF("user_id", "ts", "value"),
      dms.toDF.toDF("user_id", "ts", "event_type"),
      bandSeconds = 100, watermark = "0 seconds")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("asof_fix").start()

    // dims: a@10, b@50; facts: 5 (before any dim), 50 (AT b — inclusive),
    // 60 (after b), 200 (b is 150s back — outside the 100s band)
    dms.addData((1L, ts(50), "b"), (1L, ts(10), "a")) // out of order on purpose
    fms.addData((1L, ts(5), 1.0), (1L, ts(50), 2.0), (1L, ts(60), 3.0),
      (1L, ts(200), 4.0))
    q.processAllAvailable()
    // advance the GLOBAL watermark (min of both sides) past every fact
    fms.addData((9L, ts(1000), 0.0)); dms.addData((9L, ts(1000), "x"))
    q.processAllAvailable()
    fms.addData((9L, ts(2000), 0.0)); dms.addData((9L, ts(2000), "x"))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("asof_fix")
      .filter(col("k") === 1L).collect()
      .map(r => (r.getLong(1), Option(r.getString(3)))).toMap
    assert(got == Map(
      5000000L -> None,        // no dim at or before
      50000000L -> Some("b"),  // inclusive boundary: dim AT fact ts wins
      60000000L -> Some("b"),
      200000000L -> None),     // latest dim is 150s back, band is 100s
      s"got $got")
  }

  test("as-of stream equals the batch as-of reference on the events table (q83 twin)") {
    initQuiet()
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
    val facts = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
    val dims = ev.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("ts"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2)))
    val band = 7L * 24 * 3600 // a week: wide enough to exercise matches AND misses

    val fms = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val dms = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = StreamingOps.asOfEnrichStream(
      fms.toDF.toDF("user_id", "ts", "value"),
      dms.toDF.toDF("user_id", "ts", "event_type"),
      bandSeconds = band, watermark = "1 hour")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("asof_eq").start()
    // replay in two TIME-ordered chunks split at the median instant
    // (exercises cross-batch buffering; disorder WITHIN a chunk is
    // arbitrary, cross-chunk disorder stays inside the 1h watermark
    // horizon — rows later than that are dropped by the engine's
    // stateful late-row filter, the A9 semantics), then a sentinel far
    // past the corpus to flush every pending fact
    val cutoff = (facts.map(_._2.getTime) ++ dims.map(_._2.getTime)).sorted
      .apply((facts.length + dims.length) / 2)
    val (f1, f2) = facts.partition(_._2.getTime <= cutoff)
    val (d1, d2) = dims.partition(_._2.getTime <= cutoff)
    fms.addData(f1.toSeq); dms.addData(d1.toSeq); q.processAllAvailable()
    fms.addData(f2.toSeq); dms.addData(d2.toSeq); q.processAllAvailable()
    val far = new java.sql.Timestamp(4102444800000L) // 2100-01-01
    fms.addData((999999L, far, 0.0)); dms.addData((999999L, far, "x"))
    q.processAllAvailable()
    fms.addData((999999L, new java.sql.Timestamp(far.getTime + 1000), 0.0))
    dms.addData((999999L, new java.sql.Timestamp(far.getTime + 1000), "x"))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("asof_eq")
      .filter(col("k") =!= 999999L)
      .select(col("k"), col("fact_us"), col("value"), col("attr"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        Option(r.getString(3)))).toSet

    // batch reference: per fact, the max-(ts, attr) dim at or before the
    // fact within the band (the operator's documented tie rule)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("fus"), col("value"))
    val dm = ev.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("dus"),
        col("event_type").as("attr"))
    val ref = p.join(dm, Seq("user_id"), "left")
      .withColumn("__ok", col("dus").isNotNull &&
        col("dus") <= col("fus") && col("fus") - col("dus") <= lit(band * 1000000L))
      .groupBy(col("user_id"), col("fus"), col("value"))
      .agg(max(when(col("__ok"), struct(col("dus"), col("attr")))).as("m"))
      .select(col("user_id"), col("fus"), col("value"), col("m.attr"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        Option(r.getString(3)))).toSet
    assert(ref.nonEmpty && ref.exists(_._4.isEmpty) && ref.exists(_._4.nonEmpty),
      "fixture must exercise both matched and unmatched facts")
    assert(streamed == ref,
      s"diverged: stream-only=${(streamed -- ref).take(5)} batch-only=${(ref -- streamed).take(5)}")
  }
}
