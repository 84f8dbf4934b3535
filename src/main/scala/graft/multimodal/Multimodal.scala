package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, plus batched
  * decode/feature/frame-sample operators.
  *
  * The decode kernels themselves are STUBS — deterministic fakes, clearly
  * marked below — because no image/audio codec library ships in this
  * environment. What is real, and tested, is everything Spark-side:
  * the schema contract, the `mapPartitions` batching (the Scala analogue
  * of `mapInPandas` — rows stream through an iterator without
  * materializing a partition in memory), partition-size control for
  * ~MB-scale payloads, and parquet round-tripping of binary + struct
  * columns.
  *
  * At 100 TB: payload tables must be partitioned so that
  * `files.maxPartitionBytes` caps a task's resident payload bytes, and
  * feature extraction is a pure per-partition map — no shuffle. Decoded
  * features (small) are what flows on; payloads are pruned immediately
  * after the map, which column pruning handles because the decode is a
  * narrow projection.
  */
object Multimodal {

  val metadataType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("n_bytes", LongType),
    StructField("source", StringType)))

  /** Attach a payload + metadata to any table with a string column —
    * the corpus has no real binaries, so payload bytes are the UTF-8 of
    * `textCol` (deterministic; round-trips byte-identically).
    */
  def withPayload(df: DataFrame, textCol: String, sourceCol: String): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8"))
      .withColumn("meta", struct(
        lit("application/octet-stream").as("mime"),
        length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes"),
        col(sourceCol).as("source")))

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("features", ArrayType(FloatType))))

  /** ===== STUB DECODER =====
    * Stands in for a real image decode (e.g. JPEG → HxW + an embedding).
    * Deterministic fake: dimensions and features derive from payload
    * bytes, so tests are stable. Swap the body for a codec call when one
    * exists; the signature and batch shape are the contract.
    */
  private def fakeDecode(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val h = java.util.Arrays.hashCode(payload)
    val width = 16 + math.abs(h % 1024)
    val height = 16 + math.abs((h / 1024) % 1024)
    val features = Array.tabulate(8)(i => ((h >> i) & 0xFF).toFloat / 255f)
    (width, height, features)
  }

  /** Batched decode/feature-extract over the payload column.
    * `mapPartitions` keeps the payload iterator streaming (never a whole
    * partition in memory) — the Scala twin of a pandas-batched UDF.
    */
  def decodeFeatures(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.columns.indexOf(idCol)
    val payloadIdx = df.columns.indexOf(payloadCol)
    implicit val enc = RowEncoder.encoderFor(featureSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, f) = fakeDecode(r.getAs[Array[Byte]](payloadIdx))
        Row(r.getLong(idIdx), w, h, f.toSeq)
      }
    }
  }

  /** ===== STUB RESIZE =====
    * Stands in for image thumbnail/resize: deterministically truncates
    * the payload to `maxBytes` and rewrites the metadata in step (mime
    * tagged `;thumb`, n_bytes clamped). A real kernel decodes, scales,
    * re-encodes; the contract here — a narrow codegen'd map that
    * replaces the payload IN PLACE and keeps metadata consistent with
    * the bytes — is what downstream code relies on and what is tested.
    */
  def thumbnailStub(df: DataFrame, payloadCol: String, metaCol: String,
      maxBytes: Int): DataFrame = {
    require(maxBytes > 0, s"maxBytes must be positive, got $maxBytes")
    df.withColumn(payloadCol, expr(s"substring($payloadCol, 1, $maxBytes)"))
      .withColumn(metaCol, struct(
        concat(col(s"$metaCol.mime"), lit(";thumb")).as("mime"),
        least(col(s"$metaCol.n_bytes"), lit(maxBytes.toLong)).as("n_bytes"),
        col(s"$metaCol.source").as("source")))
  }

  /** Overlapping audio windows — the binary twin of
    * [[graft.text.TextAnalysis.chunkTokens]]: a `winBytes` window every
    * `hopBytes` over the payload (consecutive windows share
    * `winBytes − hopBytes`), start rule `s ≤ max(n − overlap, 1)` so
    * every byte is covered and the tail window may be short. A real
    * audio kernel windows PCM samples after a codec decode; byte
    * windows keep the explode cardinality, indexing, and slicing
    * honest. Narrow generate — no shuffle; output bytes ≈
    * input × win/hop.
    */
  def audioWindows(df: DataFrame, payloadCol: String,
      winBytes: Int = 64, hopBytes: Int = 32): DataFrame = {
    require(winBytes > 0 && hopBytes > 0 && hopBytes <= winBytes,
      s"need 0 < hopBytes <= winBytes, got win=$winBytes hop=$hopBytes")
    val overlap = winBytes - hopBytes
    df.withColumn("__starts",
        sequence(lit(1),
          greatest(length(col(payloadCol)) - overlap, lit(1)), lit(hopBytes)))
      .select(col("*"), posexplode(col("__starts")).as(Seq("win_idx", "__start")))
      .withColumn("window", expr(s"substring($payloadCol, __start, $winBytes)"))
      .drop("__starts", "__start")
  }

  /** ===== STUB FRAME SAMPLER =====
    * Stands in for video frame sampling: emits every `stride`-th fixed
    * -size chunk of the payload as a "frame" (explode → one row per
    * frame). Real codec would seek keyframes; the plumbing (explode
    * cardinality, frame index, byte slicing) is real.
    */
  def frameSample(df: DataFrame, payloadCol: String, frameBytes: Int = 64, stride: Int = 2): DataFrame = {
    val nFrames = floor(length(col(payloadCol)) / (frameBytes * stride)).cast("int")
    df.withColumn("frame_idx", explode(sequence(lit(0), greatest(nFrames - 1, lit(0)))))
      .withColumn("frame",
        expr(s"substring($payloadCol, frame_idx * $frameBytes * $stride + 1, $frameBytes)"))
  }
}
