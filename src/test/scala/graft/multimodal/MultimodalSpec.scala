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
}
