package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Stream-batch equivalence (SURVEY §2.3 A5/A6): replay the events table
  * as a file stream and require streaming results to equal the batch twin.
  */
class StreamingSpec extends SparkSpec {

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // timestamp[ns] read as long (nanosAsLong)
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  // file stream sources need a DIRECTORY; stage the single parquet file
  private lazy val streamDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  private def replayEvents: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(eventsSchema)
      .parquet(streamDir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
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

  test("watermark drops late rows in append mode (A9 contract)") {
    val agg = StreamingOps.windowedAgg(replayEvents, watermark = "10 minutes")
    // watermark node must be present in the analyzed plan
    assert(agg.queryExecution.analyzed.toString.contains("EventTimeWatermark"))
  }
}
