package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming operators (SURVEY.md §2.3 A5/A6/A9).
  *
  * Each op is a transformation over a streaming DataFrame — source and
  * sink stay caller-owned, so the same function body serves batch and
  * stream (stream-batch equivalence is the test strategy: replay the
  * events table as a file stream, compare with the batch twin Q14/Q11).
  *
  * Watermarks bound state: at 100 TB-rate ingest, the aggregation state
  * store only retains windows younger than the watermark; late rows
  * beyond it are dropped (observable via StreamingQueryListener metrics).
  */
object StreamingOps {

  /** Tumbling (or, with `slide`, sliding) event-time window aggregate —
    * streaming twin of Q14. */
  def windowedAgg(
      events: DataFrame,
      tsCol: String = "ts",
      window_ : String = "1 hour",
      slide: Option[String] = None,
      watermark: String = "1 hour"): DataFrame = {
    val win = slide match {
      case Some(s) => window(col(tsCol), window_, s)
      case None => window(col(tsCol), window_)
    }
    events
      .withWatermark(tsCol, watermark)
      .groupBy(win, col("event_type"))
      .agg(count(lit(1)).as("c"), round(sum(col("value")), 2).as("s"))
      .select(col("window.start").as("w"), col("event_type"), col("c"), col("s"))
  }

  /** Session windows with a 30-minute inactivity gap — streaming twin of
    * Q11's lag-based sessionization.
    *
    * Boundary semantics (SURVEY.md §7.2 hard part 4): Spark's
    * `session_window` spans [start, last_event + gap) with an EXCLUSIVE
    * end, so an event at exactly `last + gap` starts a new session —
    * while the batch twin's rule is "strictly > gap starts a new
    * session", which keeps it. To get exact batch parity, pass
    * `gap = "30 minutes 1 microsecond"` (timestamps are µs-resolution);
    * the equivalence test does. On the corpus no pair lands exactly on
    * the boundary, so both forms agree there.
    */
  def sessionAgg(
      events: DataFrame,
      tsCol: String = "ts",
      gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))

  /** Per-user session count from [[sessionAgg]] output (complete-mode
    * comparison point against Q11's `sessions` column). */
  def sessionCounts(sessionAggOut: DataFrame): DataFrame =
    sessionAggOut.groupBy(col("user_id"))
      .agg(count(lit(1)).as("sessions"), sum(col("n_events")).as("n_events"))

  /** Watermark-drop observability (A9): accumulates
    * `numRowsDroppedByWatermark` across progress events so a pipeline
    * can alert when late data is being discarded. Attach with
    * `spark.streams.addListener(listener)`.
    */
  final class DropMetricsListener extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    private val dropped = new java.util.concurrent.atomic.AtomicLong(0)
    def droppedByWatermark: Long = dropped.get()
    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit =
      e.progress.stateOperators.foreach(s => dropped.addAndGet(s.numRowsDroppedByWatermark))
  }

  /** Micro-batch sink adapter: run any batch-writing function per
    * micro-batch (the standard escape hatch for sinks Spark lacks —
    * upserts, multi-table writes). The function receives the batch as a
    * plain DataFrame plus its id for exactly-once bookkeeping.
    */
  def foreachBatchSink(df: DataFrame, name: String)(
      f: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.queryName(name).foreachBatch(f)
}
