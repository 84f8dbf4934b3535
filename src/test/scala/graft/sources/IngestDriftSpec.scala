package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Ingestion schema-drift regression (round-5 outage class).
  *
  * The driver corpus has shipped `events.ts` as int64-nanos and as
  * timestamp[us] across regenerations; round 5 lost 20 queries to a
  * loader hard-coded to one physical type. This spec writes the same
  * instants under all three physical encodings the corpus could
  * plausibly use — int64 epoch-nanos, timestamp[us] (NTZ), and
  * timestamp[us, UTC-adjusted] — and requires `Tables.normalizeTs` to
  * produce identical `unix_micros` from each.
  */
class IngestDriftSpec extends SparkSpec {
  initQuiet()

  // instants chosen to exercise sub-second precision and a ns remainder
  private val micros = Seq(
    1767312245123456L, // 2026-01-01 23:24:05.123456 UTC
    1767312245000001L,
    0L)

  private def readNorm(path: String): Seq[Long] = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.normalizeTs(spark.read.parquet(path), "ts")
      .select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq.sorted
  }

  test("int64-nanos, timestamp[us] NTZ, and timestamp[us,UTC] all normalize to the same instants") {
    val base = java.nio.file.Files.createTempDirectory("graft_drift")

    // 1. raw int64 nanos (the pre-refresh corpus; +999 ns checks truncation)
    spark.createDataFrame(
        java.util.List.of(micros.map(m => Row(m * 1000 + 999)): _*),
        StructType(Seq(StructField("ts", LongType))))
      .write.parquet(s"$base/ns")

    // 2. timestamp[us] without timezone (the refreshed corpus: NTZ)
    spark.createDataFrame(
        java.util.List.of(micros.map(m =>
          Row(java.time.LocalDateTime.ofEpochSecond(
            m / 1000000L, (m % 1000000L).toInt * 1000,
            java.time.ZoneOffset.UTC))): _*),
        StructType(Seq(StructField("ts", TimestampNTZType))))
      .write.parquet(s"$base/ntz")

    // 3. timestamp[us] UTC-adjusted (what Spark itself writes)
    spark.createDataFrame(
        java.util.List.of(micros.map(m =>
          Row(java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
            m / 1000000L, (m % 1000000L) * 1000)))): _*),
        StructType(Seq(StructField("ts", TimestampType))))
      .write.parquet(s"$base/tz")

    val expected = micros.sorted
    assert(readNorm(s"$base/ns") == expected, "int64-nanos path diverged")
    assert(readNorm(s"$base/ntz") == expected, "timestamp[us] NTZ path diverged")
    assert(readNorm(s"$base/tz") == expected, "timestamp[us,UTC] path diverged")
  }

  test("normalizeTs rejects physical types it cannot interpret") {
    val df = spark.createDataFrame(
      java.util.List.of(Row("2026-01-01")),
      StructType(Seq(StructField("ts", StringType))))
    val e = intercept[IllegalArgumentException](Tables.normalizeTs(df, "ts"))
    assert(e.getMessage.contains("Unsupported physical type"))
  }

  test("the live corpus events table loads and yields a TIMESTAMP ts at every sf") {
    Seq("sf0.001").foreach { s =>
      val ev = Tables.load(spark, s"/root/testdata/$s", "events")
      assert(ev.schema("ts").dataType.isInstanceOf[TimestampType],
        s"events.ts at $s is ${ev.schema("ts").dataType}, expected TIMESTAMP")
      assert(ev.limit(1).count() == 1)
    }
  }
}
