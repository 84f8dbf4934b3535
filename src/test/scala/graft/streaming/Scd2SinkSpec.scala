package graft.streaming

import graft.{SparkSpec, Tables}
import graft.ops.Temporal
import org.apache.spark.sql.functions._

/** Streaming SCD2 maintenance ([[StreamingOps.scd2Sink]] /
  * [[graft.sources.IO.scd2Merge]]): stream-batch equivalence under
  * per-key in-order arrival, the documented compressed-history
  * semantics for late rows, and idempotency under micro-batch replay.
  */
class Scd2SinkSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Long) = new java.sql.Timestamp(s * 1000)

  private def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Int, Long, Option[Long], Boolean)] =
    df.select(col("k"), col("attr"), col("version"),
        unix_micros(col("valid_from")),
        unix_micros(col("valid_to")), col("is_current"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getBoolean(5))).toSet

  test("streamed scd2 table equals the batch build when arrival is time-ordered") {
    val base = java.nio.file.Files.createTempDirectory("graft_scd2s")
    val (src, table) = (s"$base/src", s"$base/tbl")
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id").as("k"), col("ts"), col("event_type").as("attr"))
    val midTs = ev.withColumn("_us", unix_micros(col("ts")).cast("double"))
      .stat.approxQuantile("_us", Array(0.5), 0.001).head.toLong
    // two time-ordered files => per-key in-order arrival across batches
    ev.filter(unix_micros(col("ts")) < midTs).coalesce(1).write.parquet(s"$base/a")
    ev.filter(unix_micros(col("ts")) >= midTs).coalesce(1).write.parquet(s"$base/b")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    def place(from: String, name: String, mtime: Long): Unit = {
      val part = new java.io.File(from).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      val dst = java.nio.file.Paths.get(src, name)
      java.nio.file.Files.copy(part.toPath, dst)
      assert(dst.toFile.setLastModified(mtime))
    }
    val now = System.currentTimeMillis()
    place(s"$base/a", "b1_older.parquet", now - 60000)
    place(s"$base/b", "b2_newer.parquet", now)

    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val q = StreamingOps.scd2Sink(stream, table, "k", "ts", Seq("attr"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$base/ck").start()
    assert(q.awaitTermination(180000), "stream did not drain")

    val streamed = canon(spark.read.parquet(table))
    val batch = canon(Temporal.scd2(ev, "k", "ts", Seq("attr")))
    assert(streamed == batch, "streamed scd2 diverged from the batch build")
  }

  test("late change splits the covering version (compressed-history semantics)") {
    val base = java.nio.file.Files.createTempDirectory("graft_scd2late")
    val table = s"$base/tbl"
    val batch1 = Seq((1L, t(10), "a"), (1L, t(30), "b")).toDF("k", "ts", "attr")
    graft.sources.IO.scd2Merge(spark, table, batch1, "k", "ts", Seq("attr"))
    // late row lands INSIDE version a's validity with a different attr:
    // the covering version splits, the late version extends to the next
    // version start (the full-history resumption row was compressed away
    // and is not recoverable — the documented contract)
    val late = Seq((1L, t(20), "c")).toDF("k", "ts", "attr")
    graft.sources.IO.scd2Merge(spark, table, late, "k", "ts", Seq("attr"))
    val out = spark.read.parquet(table).orderBy("version").collect()
      .map(r => (r.getAs[String]("attr"),
        r.getAs[java.sql.Timestamp]("valid_from").getTime / 1000,
        Option(r.getAs[java.sql.Timestamp]("valid_to")).map(_.getTime / 1000)))
    assert(out.toSeq == Seq(
      ("a", 10L, Some(20L)), ("c", 20L, Some(30L)), ("b", 30L, None)))
  }

  test("re-merging the same batch is a no-op (crash-replay idempotency)") {
    val base = java.nio.file.Files.createTempDirectory("graft_scd2idem")
    val table = s"$base/tbl"
    val b = Seq((1L, t(10), "a"), (1L, t(20), "b"), (2L, t(5), "x"))
      .toDF("k", "ts", "attr")
    graft.sources.IO.scd2Merge(spark, table, b, "k", "ts", Seq("attr"))
    val first = canon(spark.read.parquet(table))
    graft.sources.IO.scd2Merge(spark, table, b, "k", "ts", Seq("attr"))
    assert(canon(spark.read.parquet(table)) == first,
      "replaying the identical batch changed the table")
  }

  test("untouched keys carry over unchanged when other keys merge") {
    val base = java.nio.file.Files.createTempDirectory("graft_scd2keys")
    val table = s"$base/tbl"
    graft.sources.IO.scd2Merge(spark, table,
      Seq((1L, t(10), "a"), (2L, t(10), "x")).toDF("k", "ts", "attr"),
      "k", "ts", Seq("attr"))
    graft.sources.IO.scd2Merge(spark, table,
      Seq((2L, t(20), "y")).toDF("k", "ts", "attr"),
      "k", "ts", Seq("attr"))
    val out = canon(spark.read.parquet(table))
    assert(out.exists(v => v._1 == 1L && v._2 == "a" && v._6),
      "untouched key 1 lost its version")
    assert(out.count(_._1 == 2L) == 2, "key 2 should have two versions")
  }
}
