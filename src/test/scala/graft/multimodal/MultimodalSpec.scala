package graft.multimodal

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val withPayload =
    Multimodal.withPayload(Tables.load(spark, sf, "documents"), "text", "source")

  test("payload + metadata round-trips through parquet byte-identically") {
    val dir = java.nio.file.Files.createTempDirectory("mm").toString
    withPayload.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("payload").dataType.typeName == "binary")
    assert(back.schema("meta").dataType == Multimodal.metadataType)
    // byte-identical: decode payload back to text and diff
    val diffs = back
      .filter(decode(col("payload"), "UTF-8") =!= col("text")).count()
    assert(diffs == 0)
    assert(back.filter(col("meta.n_bytes") =!= length(col("payload"))).count() == 0)
  }

  test("decodeFeatures: streaming per-partition decode keeps cardinality and schema") {
    val feats = Multimodal.decodeFeatures(withPayload, "doc_id", "payload")
    assert(feats.schema == Multimodal.featureSchema)
    assert(feats.count() == withPayload.count())
    val r = feats.orderBy(col("doc_id")).limit(1).collect().head
    // deterministic fake decode: stable across runs
    val r2 = Multimodal.decodeFeatures(withPayload, "doc_id", "payload")
      .orderBy(col("doc_id")).limit(1).collect().head
    assert(r == r2)
    assert(r.getSeq[Float](3).length == 8)
  }

  test("frameSample emits stride-sampled fixed-size frames with indices") {
    val frames = Multimodal.frameSample(withPayload.limit(5), "payload", frameBytes = 16, stride = 2)
    assert(frames.filter(length(col("frame")) > 16).count() == 0)
    // every source row yields >= 1 frame, frame_idx dense from 0
    assert(frames.groupBy("doc_id").agg(min("frame_idx").as("m")).filter(col("m") =!= 0).count() == 0)
  }

  test("thumbnailStub truncates payload and keeps metadata consistent") {
    val t = Multimodal.thumbnailStub(withPayload, "payload", "meta", maxBytes = 32)
    // bytes and metadata agree after the rewrite
    assert(t.filter(length(col("payload")) =!= col("meta.n_bytes")).count() == 0)
    assert(t.filter(length(col("payload")) > 32).count() == 0)
    assert(t.filter(!col("meta.mime").endsWith(";thumb")).count() == 0)
    // short payloads pass through unclipped
    val short = t.filter(col("meta.n_bytes") < 32)
    assert(short.count() == 0 || short.filter(length(col("payload")) === col("meta.n_bytes")).count() == short.count())
  }

  test("audioWindows: overlap, coverage, tail window, indices dense from 0") {
    import spark.implicits._
    val one = Seq((1L, "0123456789abcdef")).toDF("doc_id", "text")
    val p = Multimodal.withPayload(one, "text", "text")
    // 16 bytes, win 8 hop 4 -> starts 1,5,9 (s <= n-overlap=12): windows
    // [0..7] [4..11] [8..15]
    val w = Multimodal.audioWindows(p, "payload", winBytes = 8, hopBytes = 4)
      .select(col("win_idx"), decode(col("window"), "UTF-8").as("w"))
      .as[(Int, String)].collect().sortBy(_._1)
    assert(w.map(_._2).toSeq == Seq("01234567", "456789ab", "89abcdef"))
    assert(w.map(_._1).toSeq == Seq(0, 1, 2))
    // corpus-wide: no window exceeds winBytes; indices dense from 0
    val all = Multimodal.audioWindows(withPayload.limit(20), "payload", 64, 32)
    assert(all.filter(length(col("window")) > 64).count() == 0)
    assert(all.groupBy("doc_id").agg(min("win_idx").as("m")).filter(col("m") =!= 0).count() == 0)
  }
}
