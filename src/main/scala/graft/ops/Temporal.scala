package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal-modeling operators over change streams: SCD Type-2
  * versioned-dimension builds, ordered funnel analysis, and cohort
  * retention. All three are single-key-shuffle plans — the window /
  * aggregation key is the entity id, so at 100 TB they scale with the
  * entity count and never hold more than one entity's sorted run in
  * memory at a time.
  */
object Temporal {

  /** Build an SCD Type-2 versioned dimension from a change stream.
    *
    * Input: one row per observed state `(key, ts, attrs...)`. Output:
    * one row per VERSION — consecutive rows whose tracked attributes
    * did not change are compressed away (classic change-data-capture
    * compaction), then each surviving row gets `version` (1-based per
    * key), `valid_from`, `valid_to` (the next version's start, null
    * while open) and `is_current`.
    *
    * Null-safe attribute comparison (`<=>`): a null attribute equals
    * itself, so a run of nulls is ONE version, not one per row. Both
    * windows share the same partitioning key, so the plan carries a
    * single hash exchange on `keyCol`; the post-filter re-sort is
    * partition-local. At 100 TB the state stream shuffles once by
    * entity — the sorted-run streaming of the window never
    * materializes an entity's history in memory.
    */
  def scd2(df: DataFrame, keyCol: String, tsCol: String,
      attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "scd2: need at least one tracked attribute")
    val attrs = struct(attrCols.map(col): _*)
    // attrs as secondary sort: lag/lead/row_number stay deterministic
    // across partitionings even if a key carries duplicate timestamps
    // (rows identical in (ts, attrs) are interchangeable, so any residual
    // tie is semantically harmless).
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), attrs)
    val compressed = df
      .withColumn("_prev", lag(attrs, 1).over(w))
      .filter(col("_prev").isNull || !(col("_prev") <=> attrs))
      .drop("_prev")
    compressed
      .withColumn("version", row_number().over(w))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Per-user funnel depth: the greedy earliest-completion scan.
    *
    * For each user, sort the event sequence by time and advance
    * through `steps` — step i+1 only counts when it appears strictly
    * after the match of step i (the standard "ordered funnel"
    * semantics; taking the FIRST occurrence of each step is optimal,
    * so the greedy scan and the relational min-chain agree). Returns
    * `(userCol, depth)` with depth in 0..steps.length.
    *
    * ONE shuffle: `collect_list` per user, then the scan runs as a
    * codegen'd `aggregate` higher-order function over the sorted
    * in-memory sequence — no join per step, no re-shuffle per step.
    * Per-user state is that user's event list; at 100 TB bound it by
    * pre-filtering to the funnel's event types (done here) and, for
    * pathological users, a `slice` cap.
    */
  def funnelDepth(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      s"funnel steps must be non-empty and distinct: $steps")
    // Column-lambda HOF, not an interpolated SQL string: step names pass
    // through typedLit, so quotes/backslashes in a step can't break
    // parsing or inject SQL. The scan state is (depth, ts of the last
    // match); step i+1 requires x.ts STRICTLY after the step-i match —
    // the same semantics as the relational min-chain oracle, including
    // on duplicate (user, ts) pairs.
    val stepsLit = typedLit(steps)
    val n = steps.size
    df.filter(col(typeCol).isin(steps: _*))
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(struct(col(tsCol).as("ts"),
        col(typeCol).as("et")))).as("_seq"))
      .withColumn("depth", aggregate(
        col("_seq"),
        struct(lit(0).as("d"), lit(null).cast("timestamp").as("mts")),
        (s, x) => when(
          s.getField("d") < n &&
            x.getField("et") === element_at(stepsLit, s.getField("d") + 1) &&
            (s.getField("mts").isNull || x.getField("ts") > s.getField("mts")),
          struct((s.getField("d") + 1).as("d"), x.getField("ts").as("mts")))
          .otherwise(s)).getField("d"))
      .drop("_seq")
  }

  /** Funnel step counts: one row per step with the users reaching it
    * and the conversion vs step 1. A user reaching depth d contributes
    * to steps 1..d — expressed as an `explode(sequence(1, depth))`
    * (depth-0 users filtered FIRST: Spark's `sequence(1, 0)` counts
    * DOWN, it is not empty). The final window is over the ≤|steps|-row
    * aggregate — single-partition by construction, not a scale term.
    */
  def funnelSteps(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame =
    stepCounts(funnelDepth(df, userCol, tsCol, typeCol, steps), steps)

  /** Windowed funnel depth: like [[funnelDepth]], but the whole chain
    * must complete within `windowSec` seconds of the user's FIRST
    * step-1 event — the "first-touch conversion window" a growth team
    * reports on ("converted within 24 h of signup"). The scan state
    * carries (depth, last-match ts, anchor ts); a step extends only if
    * it is strictly after the previous match AND at most `windowSec`
    * after the anchor (pure integer-µs compare, engine-identical under
    * the pinned UTC session). Anchoring at the first step-1 match
    * keeps the min-chain relational form exactly oracle-expressible;
    * it deliberately does NOT search later step-1 restarts (that
    * sliding variant has no per-user-scalar SQL twin). Same one
    * user-key shuffle as [[funnelDepth]]. */
  def windowedFunnelDepth(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], windowSec: Long): DataFrame = {
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      s"funnel steps must be non-empty and distinct: $steps")
    require(windowSec > 0, s"windowSec must be positive: $windowSec")
    val stepsLit = typedLit(steps)
    val n = steps.size
    val winMicros = windowSec * 1000000L
    df.filter(col(typeCol).isin(steps: _*))
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(struct(col(tsCol).as("ts"),
        col(typeCol).as("et")))).as("_seq"))
      .withColumn("depth", aggregate(
        col("_seq"),
        struct(lit(0).as("d"), lit(null).cast("timestamp").as("mts"),
          lit(null).cast("timestamp").as("ats")),
        (s, x) => when(
          s.getField("d") < n &&
            x.getField("et") === element_at(stepsLit, s.getField("d") + 1) &&
            (s.getField("mts").isNull || x.getField("ts") > s.getField("mts")) &&
            (s.getField("ats").isNull ||
              unix_micros(x.getField("ts")) <=
                unix_micros(s.getField("ats")) + lit(winMicros)),
          struct((s.getField("d") + 1).as("d"), x.getField("ts").as("mts"),
            coalesce(s.getField("ats"), x.getField("ts")).as("ats")))
          .otherwise(s)).getField("d"))
      .drop("_seq")
  }

  /** Windowed funnel step counts — [[windowedFunnelDepth]] rolled up
    * to the per-step readout of [[funnelSteps]]. */
  def windowedFunnelSteps(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], windowSec: Long): DataFrame =
    stepCounts(
      windowedFunnelDepth(df, userCol, tsCol, typeCol, steps, windowSec),
      steps)

  private def stepCounts(depths: DataFrame, steps: Seq[String]): DataFrame = {
    val counted = depths
      .filter(col("depth") >= 1)
      .select(explode(expr("sequence(1, depth)")).as("step_idx"))
      .groupBy(col("step_idx"))
      .agg(count(lit(1)).as("n_users"))
    // Every step gets a row even when zero users reach it — the oracle's
    // counts CTE always emits |steps| rows (count(*) over an empty CTE is
    // 0), so the shapes must match. |steps| rows: broadcast by size.
    val allSteps = depths.sparkSession.range(1, steps.size + 1)
      .select(col("id").cast("int").as("step_idx"))
    val reached = allSteps.join(counted, Seq("step_idx"), "left")
      .withColumn("n_users", coalesce(col("n_users"), lit(0L)))
    val first = max(when(col("step_idx") === 1, col("n_users")))
      .over(Window.orderBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing))
    reached
      .withColumn("step", element_at(typedLit(steps), col("step_idx")))
      // conv is NULL (not an error, not Inf) when step 1 is empty — the
      // oracle divides by NULLIF(first, 0) for the same definition
      .withColumn("conv", when(first > 0,
        round(col("n_users").cast("double") / first, 6)))
      .select(col("step_idx"), col("step"), col("n_users"), col("conv"))
      .orderBy(col("step_idx"))
  }

  /** Cohort retention matrix: users bucketed by the week of their
    * first event; `n_users` = distinct users from `cohort_week` active
    * during week `cohort_week + 7·week_offset`.
    *
    * The first-seen timestamp comes from a window `min` over the user
    * partition (no self-join back to a firsts table), then
    * `(user, cohort, offset)` is deduplicated and counted. Weeks are
    * ISO Monday truncations — `date_trunc('week', …)` agrees between
    * Spark and DuckDB under the pinned UTC session — and the offset is
    * exact integer arithmetic (both week stamps are Mondays, so the
    * day difference is a multiple of 7).
    */
  /** Point-in-time ("as-was") enrichment: attach to each fact row the
    * dimension VERSION that was valid at the fact's timestamp — the
    * standard consumer of an SCD2 dimension (reports must see the state
    * a key had WHEN the fact happened, not its current state).
    *
    * Requires `scd2Dim` to be an [[scd2]] output (or any dimension
    * whose versions TILE each key's timeline: `valid_to` = next
    * version's `valid_from`, last version open). Under that contiguity
    * the version valid at fact time is exactly "the latest
    * `valid_from` <= fact ts", so the whole lookup is ONE as-of join —
    * a single key-shuffle + per-key sort ([[AsOfJoin]]'s union-window
    * form) instead of the naive range join (`valid_from <= ts <
    * valid_to`), which Spark can only plan as an equi-join on keys
    * with a residual range filter ON TOP of every (fact, version) pair
    * of the key — quadratic in per-key version count at 100 TB.
    * Facts before a key's first version (or with no dimension rows at
    * all) keep their row with null carried columns.
    *
    * Boundary: a fact AT `valid_from` sees the NEW version (inclusive,
    * matching the oracle's `vf <= ts < vt` tiling and AsOfJoin's tie
    * rule).
    */
  def pointInTime(facts: DataFrame, scd2Dim: DataFrame, keys: Seq[String],
      factTs: String, carry: Seq[(String, String)]): DataFrame =
    AsOfJoin(facts, scd2Dim, keys, factTs, "valid_from", carry)

  def cohortRetention(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    // partition by the RENAMED key: the window is applied after the
    // select below, where userCol no longer exists
    val w = Window.partitionBy(col("_u"))
    df.select(col(userCol).as("_u"), col(tsCol).as("_ts"))
      .withColumn("cohort_week", to_date(date_trunc("week", min(col("_ts")).over(w))))
      .withColumn("_wk", to_date(date_trunc("week", col("_ts"))))
      .select(col("_u"), col("cohort_week"),
        expr("datediff(_wk, cohort_week) div 7").as("week_offset"))
      .distinct()
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }
}
