package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the manual twins of AQE's runtime
  * skew-join split, for when skew is KNOWN ahead of time (a handful of
  * power-law keys owning a double-digit share of a 100 TB table) and the
  * plan should never materialize a hot partition in the first place.
  *
  * Two patterns:
  *  - [[saltedAgg]]: two-phase aggregation. Phase 1 groups on
  *    (key, salt) so a hot key's rows spread over `buckets` reducers;
  *    phase 2 re-aggregates the per-salt partials on the key alone.
  *    Only algebraic aggregates decompose this way (sum/count/min/max
  *    and avg via sum+count) — which is also why they are the only ones
  *    safe on hot keys at all.
  *  - [[saltedJoin]]: replicate the SMALL side `buckets`× (one copy per
  *    salt value), salt the big side's rows uniformly, join on
  *    (key, salt). Shuffle volume for the hot key divides by `buckets`
  *    at the cost of `buckets`× the small side — the right trade when
  *    the small side is dimension-sized but above the broadcast
  *    threshold.
  *
  * Salts derive from `xxhash64` of the whole row MIXED WITH
  * `monotonically_increasing_id()` (partition id ⧺ row offset), not
  * `rand()`: for a fixed scan order the salt is reproducible on
  * retry/speculative re-execution (which nondeterministic salting
  * breaks), and the per-row id component means a hot key made of
  * byte-identical duplicate rows — common in raw pre-dedup ingest, the
  * exact skew scenario this targets — still fans out over all buckets
  * (a row-content-only hash would send every copy to ONE bucket).
  * Correctness never depends on the assignment: any salt in
  * [0, buckets) merges identically in phase 2 / joins its replica.
  */
object Skew {

  /** Uniform deterministic salt in [0, buckets): row content ⊕ row
    * position. See object scaladoc for why both components.
    */
  private[graft] def rowSalt(df: DataFrame, buckets: Int): Column =
    pmod(
      xxhash64(struct(df.columns.map(col): _*), monotonically_increasing_id()),
      lit(buckets.toLong))

  /** Supported algebraic aggregates: value column -> (phase1, phase2). */
  sealed trait Agg
  case object Sum extends Agg
  case object Count extends Agg
  case object Min extends Agg
  case object Max extends Agg
  case object Avg extends Agg

  /** Two-phase salted aggregation. Output schema: `keys` ++ one column
    * per `(valueCol, agg)` entry named `<agg>_<valueCol>`, equal (exactly,
    * for sum/count/min/max; up to float summation order for double sums)
    * to the direct `groupBy(keys).agg(...)`.
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      aggs: Seq[(String, Agg)],
      buckets: Int = 16): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val salted = df.withColumn("__salt", rowSalt(df, buckets))
    // phase 1: partial aggregate on (keys, salt) — hot keys fan out
    val partialCols = aggs.zipWithIndex.map { case ((v, agg), i) =>
      val c = agg match {
        case Sum | Avg => sum(col(v))
        case Count     => count(col(v))
        case Min       => min(col(v))
        case Max       => max(col(v))
      }
      c.as(s"__p$i")
    } ++ aggs.zipWithIndex.collect { case ((v, Avg), i) =>
      count(col(v)).as(s"__pc$i")
    }
    val partial = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialCols.head, partialCols.tail: _*)
    // phase 2: merge partials on the true keys — input is at most
    // |distinct keys| * buckets rows, skew is gone by construction
    val finalCols = aggs.zipWithIndex.map { case ((v, agg), i) =>
      val c = agg match {
        case Sum   => sum(col(s"__p$i"))
        case Count => sum(col(s"__p$i"))
        case Min   => min(col(s"__p$i"))
        case Max   => max(col(s"__p$i"))
        case Avg   => sum(col(s"__p$i")) / sum(col(s"__pc$i"))
      }
      val name = agg match {
        case Sum => s"sum_$v"; case Count => s"count_$v"
        case Min => s"min_$v"; case Max => s"max_$v"; case Avg => s"avg_$v"
      }
      c.as(name)
    }
    partial.groupBy(keys.map(col): _*).agg(finalCols.head, finalCols.tail: _*)
  }

  /** Salted equi-join: `big` (skewed) ⋈ `small` on `keys`. The small side
    * is exploded `buckets`× (cheap, it's small); each big-side row joins
    * exactly one replica, so result multiplicity is unchanged.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      buckets: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    // right/full outer would emit unmatched SMALL replicas `buckets`
    // times — multiplicity only survives salting when the preserved side
    // is the big one
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti").contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left join types, got $joinType")
    val saltedBig = big.withColumn("__salt", rowSalt(big, buckets))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    saltedBig.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
