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
      // The corpus has regenerated with different physical types for
      // events.ts over time (timestamp[ns] → timestamp[us]); an engine
      // with 100 TB posture must tolerate upstream type drift, so branch
      // on the OBSERVED schema, not the table name:
      //  - int64 (nanosAsLong) → truncate ns→µs with integer division,
      //    identical to DuckDB's internal ns→µs truncation. Plain double
      //    division would lose precision (1.7e18 ns > 2^53).
      //  - TIMESTAMP_NTZ (timestamp[us] without tz) → cast to the session
      //    timestamp type; under the pinned UTC session the instants are
      //    identical and downstream unix_micros/window/lag code is unchanged.
      //  - TIMESTAMP → already what every operator expects; pass through.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      if (name == "events") normalizeTs(df, "ts") else df
    })

  /** Schema-adaptive timestamp normalization (see `load`). Public so the
    * ingestion drift-regression spec can exercise it on fixture files.
    */
  def normalizeTs(df: DataFrame, colName: String): DataFrame = {
    import org.apache.spark.sql.types._
    df.schema(colName).dataType match {
      case LongType          => df.withColumn(colName, expr(s"timestamp_micros($colName div 1000)"))
      case _: TimestampNTZType => df.withColumn(colName, col(colName).cast("timestamp"))
      case _: TimestampType  => df
      case other =>
        throw new IllegalArgumentException(
          s"Unsupported physical type for $colName: $other (expected int64-nanos, timestamp[us] or timestamp[us,UTC])")
    }
  }

  /** Register every table as a temp view (SQL entry point E2). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
