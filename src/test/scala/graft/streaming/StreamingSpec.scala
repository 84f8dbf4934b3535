package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Stream-batch equivalence (SURVEY §2.3 A5/A6): replay the events table
  * as a file stream and require streaming results to equal the batch twin.
  */
class StreamingSpec extends SparkSpec {

  // Derived from the live file, not hard-coded: the corpus has shipped
  // events.ts as both int64-nanos and timestamp[us] across regenerations,
  // and a replay schema pinned to one physical type goes dark on the next
  // drift. Tables.normalizeTs then maps whichever type we got to TIMESTAMP.
  private lazy val eventsSchema: StructType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sf/events.parquet").schema
  }

  private def replayEvents: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.normalizeTs(
      graft.sources.IO.replayStream(spark, s"$sf/events.parquet", eventsSchema), "ts")
  }

  private def runToCompletion(df: DataFrame, name: String): DataFrame = {
    val q = df.writeStream.outputMode("complete")
      .format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("streaming tumbling 1h agg equals batch Q14 aggregation") {
    val streamed = runToCompletion(
      StreamingOps.windowedAgg(replayEvents), "tumbling")
      .orderBy("w", "event_type").collect()
    val batch = StreamingOps.windowedAgg(Tables.load(spark, sf, "events"))
      .orderBy("w", "event_type").collect()
    assert(streamed.length == batch.length)
    assert(streamed.sameElements(batch))
  }

  test("streaming SLIDING 1h/30m agg equals the batch q56 twin") {
    val streamed = runToCompletion(
      StreamingOps.windowedAgg(replayEvents, slide = Some("30 minutes")), "sliding")
      .orderBy("w", "event_type").collect()
    val batch = StreamingOps.windowedAgg(
        Tables.load(spark, sf, "events"), slide = Some("30 minutes"))
      .orderBy("w", "event_type").collect()
    assert(streamed.length == batch.length && streamed.sameElements(batch))
    // and the batch twin agrees with the q56 inventory query (sans limit)
    val q56 = graft.ops.Relational.q56(spark, sf).collect()
    assert(batch.take(q56.length).sameElements(q56))
  }

  test("streaming session windows equal batch Q11 sessionization") {
    // gap + 1µs: session_window's exclusive window end vs the batch
    // rule's strictly-greater gap (see StreamingOps.sessionAgg scaladoc)
    val streamed = StreamingOps.sessionCounts(
      runToCompletion(
        StreamingOps.sessionAgg(replayEvents, gap = "30 minutes 1 microsecond"),
        "sessions"))
      .orderBy("user_id").collect()
    val batch = graft.ops.Relational.q11(spark, sf)
      .select(col("user_id"), col("sessions"), col("n_events")).collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.getLong(0) == b.getLong(0), "user mismatch")
      assert(s.getLong(1) == b.getLong(1), s"sessions mismatch for user ${s.getLong(0)}")
      assert(s.getLong(2) == b.getLong(2), s"event count mismatch for user ${s.getLong(0)}")
    }
  }

  test("file sink + checkpoint: restart resumes exactly-once, no duplicates") {
    // the durability contract: a stopped query restarted on the same
    // checkpoint processes ONLY data it has not yet committed — rows are
    // neither lost nor written twice across restarts
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val base = java.nio.file.Files.createTempDirectory("graft_ckpt")
    val (src, out, ck) = (s"$base/src", s"$base/out", s"$base/ck")
    val ev = spark.read.schema(eventsSchema).parquet(s"$sf/events.parquet")
    val firstHalf = ev.filter(col("event_id") % 2 === 0)
    val secondHalf = ev.filter(col("event_id") % 2 =!= 0)
    firstHalf.write.parquet(src)

    def drainOnce(): Unit = {
      val q = spark.readStream.schema(eventsSchema).parquet(src)
        .writeStream.format("parquet")
        .option("checkpointLocation", ck).option("path", out)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "stream did not drain in time")
    }

    drainOnce()
    assert(spark.read.parquet(out).count() == firstHalf.count())
    // new data lands while the query is DOWN; restart picks up only it
    secondHalf.write.mode("append").parquet(src)
    drainOnce()
    val result = spark.read.parquet(out)
    assert(result.count() == ev.count(), "lost or duplicated rows across restart")
    assert(result.select("event_id").distinct().count() == ev.count(),
      "duplicate event_ids after restart")
  }

  test("watermark drops late rows in append mode (A9 contract)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(min: Int) = new java.sql.Timestamp(min * 60000L)

    val dropMetrics = new StreamingOps.DropMetricsListener
    spark.streams.addListener(dropMetrics)

    val ms = MemoryStream[(java.sql.Timestamp, String, Double)]
    val agg = StreamingOps.windowedAgg(
      ms.toDF.toDF("ts", "event_type", "value"),
      window_ = "10 minutes", watermark = "10 minutes")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("late_test").start()

    // window [0,10) gets 2 events; event at min 60 pushes the watermark
    // to min 50, closing and emitting [0,10)
    ms.addData((ts(1), "click", 1.0), (ts(2), "click", 1.0))
    q.processAllAvailable()
    ms.addData((ts(60), "click", 1.0))
    q.processAllAvailable()
    val emitted = spark.table("late_test")
      .filter($"w" === ts(0) && $"event_type" === "click").collect()
    assert(emitted.length == 1 && emitted.head.getAs[Long]("c") == 2L)

    // a LATE event for the closed [0,10) window must be dropped, not
    // re-emitted (append mode never updates an emitted window)
    ms.addData((ts(3), "click", 1.0))
    q.processAllAvailable()
    ms.addData((ts(120), "click", 1.0))
    q.processAllAvailable()
    q.stop()
    val after = spark.table("late_test")
      .filter($"w" === ts(0) && $"event_type" === "click").collect()
    assert(after.length == 1 && after.head.getAs[Long]("c") == 2L,
      "late row was not dropped by the watermark")
    // the drop is observable through the listener metrics
    assert(dropMetrics.droppedByWatermark >= 1,
      s"listener saw ${dropMetrics.droppedByWatermark} dropped rows")
    spark.streams.removeListener(dropMetrics)
  }

  test("stream-static enrichment keeps unmatched stream rows (left join)") {
    import spark.implicits._
    // dimension covers only even user ids — odd ids must survive with null cohort
    val dim = Tables.load(spark, sf, "events")
      .select(col("user_id")).distinct()
      .filter(col("user_id") % 2 === 0)
      .withColumn("cohort", concat(lit("c"), col("user_id") % 4))
    val enriched = StreamingOps.enrichStream(replayEvents, dim, Seq("user_id"))
      .groupBy(col("cohort")).agg(count(lit(1)).as("n"))
    val q = enriched.writeStream.outputMode("complete")
      .format("memory").queryName("enriched").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("enriched")
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    val evB = Tables.load(spark, sf, "events")
    val batch = StreamingOps.enrichStream(evB, dim, Seq("user_id"))
      .groupBy(col("cohort")).agg(count(lit(1)).as("n"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(streamed == batch)
    assert(streamed.contains(None), "odd-id rows were dropped instead of kept")
    assert(streamed(None) == evB.filter(col("user_id") % 2 =!= 0).count())
  }

  test("stream-stream banded join equals the batch band join") {
    val clicks = replayEvents.filter(col("event_type") === "click")
    val purchases = replayEvents.filter(col("event_type") === "purchase")
    val joined = StreamingOps.bandedStreamJoin(
      clicks, purchases, "user_id", bandSeconds = 600)
    // stream-stream inner joins emit in append mode only
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ss_join").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ss_join")
      .orderBy("user_id", "l_ts", "r_ts").collect()
    val evB = Tables.load(spark, sf, "events")
    val batch = StreamingOps.bandedStreamJoin(
        evB.filter(col("event_type") === "click"),
        evB.filter(col("event_type") === "purchase"),
        "user_id", bandSeconds = 600)
      .orderBy("user_id", "l_ts", "r_ts").collect()
    assert(batch.nonEmpty, "fixture should produce matches")
    assert(streamed.length == batch.length,
      s"streamed ${streamed.length} rows vs batch ${batch.length}")
    assert(streamed.sameElements(batch))
  }

  test("banded join carries payload columns with side prefixes") {
    // the attribution use case needs the matched row's payload, not
    // just its timestamp — dropping payloads made the operator useless
    import spark.implicits._
    def ts(min: Int) = new java.sql.Timestamp(min * 60000L)
    val clicks = Seq((1L, ts(1), "c1")).toDF("user_id", "ts", "click_id")
    val purchases = Seq((1L, ts(2), 9.99)).toDF("user_id", "ts", "amount")
    val out = StreamingOps.bandedStreamJoin(clicks, purchases, "user_id",
      bandSeconds = 600)
    assert(out.columns.toSeq ==
      Seq("user_id", "l_ts", "l_click_id", "r_ts", "r_amount"), out.columns.toSeq)
    val row = out.head()
    assert(row.getString(2) == "c1" && row.getDouble(4) == 9.99)
  }

  test("left-outer banded stream join emits unmatched rows after the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(min: Int) = new java.sql.Timestamp(min * 60000L)

    val lms = MemoryStream[(Long, java.sql.Timestamp)]
    val rms = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = StreamingOps.bandedStreamJoin(
      lms.toDF.toDF("user_id", "ts"), rms.toDF.toDF("user_id", "ts"),
      "user_id", bandSeconds = 60, watermark = "1 minute",
      joinType = "left_outer")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("lo_join").start()

    // user 1: purchase inside the 60s band -> matched pair
    // user 2: no purchase ever -> must STILL emit, null-padded, once
    //         the watermark passes its band end
    lms.addData((1L, ts(1)), (2L, ts(1)))
    rms.addData((1L, ts(2)))
    q.processAllAvailable()
    // advance BOTH watermarks well past min 2 (global wm = min of sides)
    lms.addData((9L, ts(60)))
    rms.addData((9L, ts(60)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("lo_join")
      .collect().map(r => (r.getLong(0), Option(r.get(2)))).toSet
    assert(rows.contains((1L, Some(ts(2)))), s"matched pair missing: $rows")
    assert(rows.contains((2L, None)),
      s"unmatched left row not emitted after watermark: $rows")
  }

  test("dedupStream drops within-watermark duplicates with bounded state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(min: Int) = new java.sql.Timestamp(min * 60000L)

    val ms = MemoryStream[(java.sql.Timestamp, String)]
    val deduped = StreamingOps.dedupStream(
      ms.toDF.toDF("ts", "k"), keys = Seq("k"), watermark = "30 minutes")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream").start()
    ms.addData((ts(1), "a"), (ts(1), "a"), (ts(2), "b"))
    q.processAllAvailable()
    ms.addData((ts(3), "a"), (ts(4), "c")) // "a" still within watermark -> dup
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dedup_stream").collect()
      .map(r => r.getString(1)).groupBy(identity).view.mapValues(_.length).toMap
    assert(out == Map("a" -> 1, "b" -> 1, "c" -> 1), s"got $out")
  }

  test("flatMapGroupsWithState sessionization equals hand-computed sessions") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // offset from epoch 0: rows AT the initial watermark boundary (0) are
    // treated as late and dropped — a degenerate edge, not the contract
    val base = 86400000L
    def ts(min: Int) = new java.sql.Timestamp(base + min * 60000L)
    def us(min: Int) = base * 1000L + min * 60000000L

    val ms = MemoryStream[(Long, java.sql.Timestamp)]
    val sessions = StreamingOps.sessionizeWithState(
      ms.toDF.toDF("user_id", "ts"), gapMinutes = 30, watermark = "10 minutes")
    val q = sessions.toDF.writeStream.outputMode("append")
      .format("memory").queryName("fmgws").start()

    // user 1: events at 0, 10, 50 -> gap 40 > 30 closes [0,10] in-batch;
    // user 2: single event at 0
    ms.addData((1L, ts(0)), (1L, ts(10)), (1L, ts(50)), (2L, ts(0)))
    q.processAllAvailable()
    // sentinel batches: advance the watermark far past every timeout,
    // then once more so timeouts (planned against the PREVIOUS batch's
    // watermark) actually fire
    ms.addData((99L, ts(600)))
    q.processAllAvailable()
    ms.addData((99L, ts(1200)))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("fmgws").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val expected = Set(
      (1L, us(0), us(10), 2L),  // closed by the gap-exceeding event at 50
      (1L, us(50), us(50), 1L), // closed by event-time timeout
      (2L, us(0), us(0), 1L))   // closed by event-time timeout
    assert(expected.subsetOf(got), s"missing ${expected -- got}; got $got")
    // user 99's open session may or may not have timed out — but no
    // session may be emitted twice and none may be spurious for users 1/2
    assert(got.count(_._1 == 1L) == 2 && got.count(_._1 == 2L) == 1)
  }

  test("transformWithState running activity accumulates across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    // transformWithState requires the RocksDB provider (also the 100 TB
    // posture: off-heap state + changelog checkpoints)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[(Long, Double)]
      val q = StreamingOps.runningActivity(ms.toDF.toDF("user_id", "value"))
        .toDF.writeStream.outputMode("update")
        .format("memory").queryName("tws").start()
      ms.addData((1L, 2.0), (1L, 3.0), (2L, 10.0))
      q.processAllAvailable()
      ms.addData((1L, 5.0))
      q.processAllAvailable()
      q.stop()
      // the ttl knob must START and process data (TimeMode must be
      // ProcessingTime when a TTLConfig is set — TimeMode.None + TTL is
      // rejected by Spark at first batch). Processing-time mode keeps
      // scheduling clock-driven maintenance batches, so the query never
      // reports caught-up — poll the sink with a deadline, then stop.
      val ms2 = MemoryStream[(Long, Double)]
      ms2.addData((7L, 1.0))
      val q2 = StreamingOps.runningActivity(ms2.toDF.toDF("user_id", "value"),
          ttl = Some(java.time.Duration.ofHours(1)))
        .toDF.writeStream.outputMode("update")
        .format("memory").queryName("tws_ttl").start()
      val deadline = System.currentTimeMillis() + 60000
      while (spark.table("tws_ttl").count() < 1 &&
        System.currentTimeMillis() < deadline) Thread.sleep(200)
      q2.stop()
      assert(spark.table("tws_ttl").count() == 1, "ttl variant produced no rows")
      // last emission per user carries the cumulative totals
      val last = spark.table("tws").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).map { case (u, rows) => u -> rows.maxBy(_._2) }
      assert(last(1L) == (1L, 3L, 10.0), s"user 1 got ${last(1L)}")
      assert(last(2L) == (2L, 1L, 10.0), s"user 2 got ${last(2L)}")
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("upsertSink maintains the latest-per-user table across micro-batches") {
    val base = java.nio.file.Files.createTempDirectory("graft_upsink")
    val table = s"$base/latest"
    // replay paced at 1 file/trigger so the upsert path (not just the
    // initial create) is exercised across several micro-batches
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = s"$base/src"
    val ev = spark.read.schema(eventsSchema).parquet(s"$sf/events.parquet")
    ev.filter(col("event_id") % 2 === 0).write.parquet(src)
    ev.filter(col("event_id") % 2 =!= 0).write.mode("append").parquet(src)
    val stream = spark.readStream.schema(eventsSchema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val q = StreamingOps.upsertSink(stream, table,
        keys = Seq("user_id"), orderCols = Seq("ts", "event_id"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$base/ck").start()
    assert(q.awaitTermination(120000), "stream did not drain")

    val got = spark.read.parquet(table)
      .select("user_id", "event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = graft.ops.Relational.latestByKey(ev, Seq("user_id"), Seq("ts", "event_id"))
      .select("user_id", "event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, "streamed upsert view diverged from the batch twin")
  }

  test("upsertSink exactly-once: crash between merge and checkpoint commit replays idempotently") {
    // The adversarial window: batch 1's MERGE completes, then the job
    // dies BEFORE the checkpoint commit. On restart Spark replays batch
    // 1; the event-time upsert must absorb the double merge (same keys,
    // same max-by-order winners) so the table still equals the batch
    // latest-by-key view — the same discipline batch upsert is tested
    // for, now under a real streaming replay.
    val base = java.nio.file.Files.createTempDirectory("graft_upscrash")
    val table = s"$base/latest"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = s"$base/src"
    val ev = spark.read.schema(eventsSchema).parquet(s"$sf/events.parquet")
    ev.filter(col("event_id") % 2 === 0).write.parquet(src)
    ev.filter(col("event_id") % 2 =!= 0).write.mode("append").parquet(src)
    val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
    def start() = {
      val stream = spark.readStream.schema(eventsSchema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      StreamingOps.foreachBatchSink(stream, "upsert_crash") { (batch, id) =>
        StreamingOps.upsertBatch(batch, table,
          Seq("user_id"), Seq("ts", "event_id"))
        if (id == 1 && !crashed.getAndSet(true))
          throw new RuntimeException(
            "injected crash between merge and checkpoint commit")
      }.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", s"$base/ck").start()
    }
    val q1 = start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination()
    }
    assert(e.getMessage.contains("injected crash"), e.getMessage)
    // the merge ran: the table already holds batch 1's rows even though
    // the batch never committed — the exact double-apply hazard
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(table)))
    val q2 = start()
    assert(q2.awaitTermination(120000), "restart did not drain")
    val got = spark.read.parquet(table)
      .select("user_id", "event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = graft.ops.Relational.latestByKey(ev, Seq("user_id"), Seq("ts", "event_id"))
      .select("user_id", "event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want,
      "replayed micro-batch double-applied: table diverged from the batch twin")
  }

  test("foreachBatch sink receives micro-batches with ids") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Int]
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val q = StreamingOps.foreachBatchSink(ms.toDF, "febatch") {
      (batch, id) => seen.add((id, batch.count()))
    }.start()
    ms.addData(1, 2, 3)
    q.processAllAvailable()
    ms.addData(4)
    q.processAllAvailable()
    q.stop()
    val batches = seen.toArray(Array.empty[(Long, Long)]).toSeq
    assert(batches.map(_._2).sum == 4)
    assert(batches.map(_._1).distinct.size == batches.size)
  }
}
