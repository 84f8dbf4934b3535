package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}
import org.apache.spark.util.sketch.BloomFilter

/** Join-input pruning with a driver-built Bloom filter.
  *
  * The 100 TB problem this solves: an inner join between a huge fact
  * table and a selective dimension shuffles the ENTIRE fact side, even
  * though only the rows whose keys survive the dimension filter can
  * match. A Bloom filter over the dimension keys, applied to the fact
  * side BEFORE its shuffle, drops the non-matching bulk at scan time —
  * shuffle volume follows the match rate, not the fact size. Bloom
  * filters have no false negatives, so no matching row is ever lost;
  * false positives (rate `fpp`) survive the pre-filter and are removed
  * by the join itself — the result is exactly the plain join's.
  *
  * Spark's AQE can inject this automatically
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) when it can SEE
  * the selective filter in the plan. The explicit form here covers the
  * cases the planner can't: a small side produced by an opaque upstream
  * computation (a collected sample, an external id list, a previous
  * round's survivors) where Catalyst has no selectivity estimate.
  *
  * Sizing: ~9.6 bits/key at fpp=1% — 10⁸ distinct dimension keys ≈
  * 115 MB, the practical broadcast ceiling; beyond that fall back to a
  * shuffled semi-join (the filter itself becomes the shuffle).
  */
object Prune {

  /** Build a Bloom filter over the DISTINCT values of `keyCol` (sizing
    * by raw row count would inflate the filter by the duplication
    * factor — a 10⁹-row reference list over 10⁶ distinct keys must size
    * at 10⁶). The distinct key set is persisted for the two passes over
    * it (count for sizing, then the filter aggregate) and released
    * before returning; the filter object lands on the driver, KB–MB
    * sized at realistic key cardinalities. */
  def bloomFor(keys: DataFrame, keyCol: String, fpp: Double = 0.01): BloomFilter = {
    val distinctKeys = keys.select(keyCol).distinct().persist()
    try {
      val n = math.max(distinctKeys.count(), 1L)
      distinctKeys.stat.bloomFilter(keyCol, n, fpp)
    } finally distinctKeys.unpersist()
  }

  /** Membership-test column for `key` against a driver-held filter.
    * Integral keys probe as long (matching `stat.bloomFilter`'s put
    * dispatch); nulls test false (a null never equi-joins). */
  def mightContain(bf: BloomFilter, key: Column, keyType: org.apache.spark.sql.types.DataType): Column =
    keyType match {
      case LongType | IntegerType | ShortType | ByteType =>
        val f = udf((k: java.lang.Long) => k != null && bf.mightContainLong(k))
        f(key.cast("long"))
      case StringType =>
        val f = udf((k: String) => k != null && bf.mightContainString(k))
        f(key)
      case other =>
        throw new IllegalArgumentException(
          s"bloom pruning supports integral/string keys, got $other")
    }

  /** Inner join `big ⋈ small` with the big side pre-pruned by a Bloom
    * filter over `small`'s keys. Result is EXACTLY `big.join(small)` —
    * pruning is invisible in the output (no false negatives; false
    * positives die in the join). Only join types that drop unmatched
    * big rows are sound here (inner / left_semi): for an outer join the
    * pre-filter would delete rows the join must keep.
    */
  /** NOTE on evaluation count: `small` is evaluated once for the filter
    * build and again when the join runs — inherent to any plan that
    * both summarizes and joins a dataset. If `small` is an expensive
    * upstream computation, `persist()` it before calling (the build
    * itself dedups and caches only the key column, not `small`). */
  def bloomPrunedJoin(
      big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
      fpp: Double = 0.01, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left_semi",
      s"bloom pruning is only sound for inner/left_semi joins, got $joinType")
    val bf = bloomFor(small.select(smallKey), smallKey, fpp)
    val pruned = big.filter(mightContain(bf, col(bigKey), big.schema(bigKey).dataType))
    pruned.join(small, pruned(bigKey) === small(smallKey), joinType)
  }
}
