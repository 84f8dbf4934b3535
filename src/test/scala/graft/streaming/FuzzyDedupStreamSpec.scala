package graft.streaming

import graft.{SparkSpec, Tables}
import graft.text.Dedup
import org.apache.spark.sql.functions._

/** Stream-batch equivalence for [[StreamingOps.dedupStreamFuzzy]] (the
  * r9 streaming near-dup gate): replaying the documents table as a
  * multi-batch file stream must emit exactly the batch
  * [[Dedup.nearMinhash]] pair set, and the horizon must bound both
  * pairing and state.
  */
class FuzzyDedupStreamSpec extends SparkSpec {

  test("dedupStreamFuzzy == batch nearMinhash on the documents replay") {
    initQuiet()
    // synthetic event times: one doc per second in doc_id order, so the
    // replay has a deterministic timeline and 'later doc' is well-defined
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"),
        timestamp_micros(lit(1700000000000000L) + col("doc_id") * 1000000L)
          .as("ts"))
    val src = java.nio.file.Files.createTempDirectory("fuzzy_replay").toString
    docs.repartitionByRange(4, col("ts")).write.mode("overwrite").parquet(src)
    val stream = graft.sources.IO.replayStream(spark, src,
      spark.read.parquet(src).schema)
    // the file source replays the 4 files in arbitrary order, so docs
    // arrive out of event-time order across micro-batches: the watermark
    // delay must exceed the replay's full time span or early docs are
    // (correctly) dropped as late — here equivalence, not lateness, is
    // under test
    val pairs = StreamingOps.dedupStreamFuzzy(stream, "doc_id", "text", "ts",
      horizonSeconds = 7L * 24 * 3600, watermark = "30 days")
    val q = pairs.writeStream.outputMode("append")
      .format("memory").queryName("fuzzy_pairs").start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("fuzzy_pairs").collect()
    val got = out.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
      r.getAs[Double]("jaccard"))).toSet
    val ref = Dedup.nearMinhash(docs, "doc_id", "text").collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("jaccard"))).toSet
    assert(got === ref,
      s"pair sets diverged: only-batch=${(ref -- got).take(5)} " +
        s"only-stream=${(got -- ref).take(5)}")
    assert(got.nonEmpty, "corpus has planted near-dups; empty = broken")
    // exactly-once: the lowest-band rule must not double-emit a pair
    assert(out.length === got.size, "a pair was emitted by more than one band")
    // gate verdicts: timeline is doc_id order, so dup = the larger id
    out.foreach { r =>
      assert(r.getAs[Long]("keep_id") < r.getAs[Long]("dup_id"))
      assert(r.getAs[Long]("dup_id") === r.getAs[Long]("id_b"))
    }
  }

  test("horizon bounds pairing: twins beyond horizonSeconds never pair") {
    initQuiet()
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val text = "the quick brown fox jumps over the lazy dog again and again"
    def t(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000L)
    val ms = MemoryStream[(Long, String, java.sql.Timestamp)]
    val df = ms.toDF().toDF("doc_id", "text", "ts")
    val pairs = StreamingOps.dedupStreamFuzzy(df, "doc_id", "text", "ts",
      horizonSeconds = 3600, watermark = "0 seconds")
    val q = pairs.writeStream.outputMode("append")
      .format("memory").queryName("fuzzy_horizon").start()
    // doc 1 at t=0; doc 2 (identical) at t=2h — OUTSIDE the 1h horizon;
    // doc 3 (identical) at t=2h+60s — inside doc 2's horizon
    ms.addData((1L, text, t(0)))
    q.processAllAvailable()
    ms.addData((2L, text, t(7200)))
    q.processAllAvailable()
    ms.addData((3L, text, t(7260)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("fuzzy_horizon").collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("keep_id"), r.getAs[Long]("dup_id"))).toSet
    assert(got === Set((2L, 3L, 2L, 3L)),
      s"expected only the within-horizon pair (2,3), got $got")
  }
}
