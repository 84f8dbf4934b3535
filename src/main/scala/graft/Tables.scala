package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loads the driver-generated parquet corpus (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. At 100 TB these would be
  * partitioned directories; nothing here assumes single-file inputs —
  * `spark.read.parquet` takes files or directories alike.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Memoized per (session, sfDir, table): building a fresh parquet
  // relation runs file-listing + footer-read jobs (2-3 driver-side
  // stages, ~50 ms) on EVERY call — measurable per-query overhead when
  // the data itself is sub-second. The DataFrame is an immutable plan;
  // reusing it across queries is safe, and cache()d plans keep matching.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, sfDir, name), { _ =>
      // events.ts is parquet timestamp[ns], which Spark's reader rejects
      // (PARQUET_TYPE_ILLEGAL). Read nanos as long and truncate to µs with
      // integer division — identical to DuckDB's internal ns→µs truncation
      // (FIXTURES.md hazard 1). Plain double division would lose precision
      // (1.7e18 ns > 2^53).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      if (name == "events")
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else df
    })

  /** Register every table as a temp view (SQL entry point E2). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
