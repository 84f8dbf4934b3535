package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.broadcast

/** The 100 TB posture, as code (SURVEY.md §4.3). Two profiles:
  *
  *  - [[localBench]] — what the Bench/Verify mains use: AQE off (its
  *    re-planning overhead exceeds its benefit at sub-second queries),
  *    shuffle partitions sized to the data not the cores, generous
  *    broadcast threshold inside one JVM.
  *  - [[cluster]] — the settings this engine expects on a real cluster.
  *    Applied via `SparkSession.Builder.config(...)`; they are defaults,
  *    not magic: partition/bucket layout (see [[graft.sources.IO]]) and
  *    operator shape (see PlanSpec ceilings) matter more.
  *
  * Cluster rationale, knob by knob:
  *  - AQE ON + coalescePartitions: 100 TB scans start wide
  *    (maxPartitionBytes controls split size → ~800 k input tasks at
  *    128 MB); AQE coalesces post-shuffle partitions to
  *    advisoryPartitionSizeInBytes so reducers stay ~256 MB regardless
  *    of what the static count was.
  *  - skewJoin: splits straggler partitions (hot user_id/event_type
  *    keys in the windows/sessionization family) instead of letting one
  *    reducer run for hours — salting is then only needed for
  *    aggregation skew, not join skew.
  *  - shuffle.partitions is deliberately large (AQE shrinks, never
  *    grows): undersized static shuffles are the classic 100 TB OOM.
  *  - broadcast threshold stays modest on clusters: a 1 GB broadcast ×
  *    1000 executors is a terabyte of redundant heap.
  */
object ScaleConfig {

  def localBench(b: SparkSession.Builder, cores: Int, shufflePartitions: Int): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (32 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  /** Broadcast hint for DATA-SCALING build sides — sides derived from
    * corpus tables (a filtered customer dim, a distinct orders key set)
    * that are comfortably broadcastable at bench scale but grow with
    * the data. The hint is applied only while the session permits
    * broadcasts; when the operator disables auto-broadcast
    * (`spark.sql.autoBroadcastJoinThreshold=-1` — the posture of a
    * cluster where no corpus-derived side fits executor memory), the
    * hint is withheld so Catalyst demotes the join cleanly to
    * sort-merge / shuffled-hash instead of being FORCED into an
    * impossible broadcast by a stale hint (an explicit hint overrides
    * the threshold, so without this gate threshold=-1 could not demote
    * these joins).
    *
    * Contrast with BOUNDED sides — nation (25 rows), region (5),
    * scalar-aggregate thresholds, k-means centroids — which keep their
    * unconditional `broadcast()` hints: they are O(1)-sized by
    * construction at any corpus scale, and broadcasting them is right
    * even on a 1000-executor cluster.
    */
  def scalingBroadcast(df: DataFrame): DataFrame =
    if (broadcastDisabled(df.sparkSession)) df else broadcast(df)

  /** True when auto-broadcast is globally off (threshold set negative).
    * Spark renders the conf as a byte string ("-1", "-1b", "10485760b");
    * a leading '-' is the disabled posture. */
  def broadcastDisabled(spark: SparkSession): Boolean =
    spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
      .trim.startsWith("-")

  def cluster(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256m")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "3")
      .config("spark.sql.shuffle.partitions", "4096")
      .config("spark.sql.files.maxPartitionBytes", "128m")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // stateful streaming at scale: RocksDB keeps per-executor state
      // off-heap/on-disk with changelog checkpoints (vs the default
      // HDFS-backed provider's full-snapshot-in-heap); required by
      // transformWithState, strictly better for big flatMapGroupsWith
      // State / dedupStream state too
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
}
