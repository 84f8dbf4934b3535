package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-sided interval overlap join: pairs (l, r) with
  * `l.start <= r.end AND r.start <= l.end` (inclusive endpoints),
  * without a nested loop.
  *
  * Rewrite: tile time into fixed buckets of `bucketSeconds`; each
  * interval explodes to every bucket it touches; overlapping intervals
  * necessarily share the bucket containing their overlap's START
  * (`floor(max(l.start, r.start) / w)`), so an equi-join on the bucket
  * finds every overlapping pair — and keeping ONLY the join row whose
  * bucket equals that start bucket emits each pair exactly once with
  * no `distinct` pass. One keyed shuffle; µs-exact predicate.
  *
  * Scale: per-interval fan-out is `span/bucketSeconds + 1` rows, so
  * pick the bucket near the typical interval span (fan-out O(1));
  * long-tail intervals cost proportionally more index rows but never
  * an all-pairs product. Add equi keys (e.g. a tenant column) to the
  * bucket key via `extraKeys` to shard the time axis further.
  */
object IntervalJoin {

  def overlapJoin(
      left: DataFrame, right: DataFrame,
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      bucketSeconds: Long,
      extraKeys: Seq[String] = Nil): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val clash = left.columns.toSet.intersect(right.columns.toSet) -- extraKeys.toSet
    require(clash.isEmpty,
      s"non-key columns must have distinct names across sides; rename: $clash")
    val w = bucketSeconds * 1000000L
    def us(c: Column) = unix_micros(c.cast("timestamp"))
    def bucketOf(c: Column) = floor(us(c) / w)

    val l = left.withColumn("__b",
      explode(sequence(bucketOf(col(leftStart)), bucketOf(col(leftEnd)))))
    val r = right.withColumn("__b",
      explode(sequence(bucketOf(col(rightStart)), bucketOf(col(rightEnd)))))

    val joinCols = extraKeys :+ "__b"
    l.join(r, joinCols)
      // inclusive overlap, µs precision
      .filter(us(col(leftStart)) <= us(col(rightEnd)) &&
        us(col(rightStart)) <= us(col(leftEnd)))
      // emit each pair once: only in the bucket holding the overlap start
      .filter(col("__b") ===
        floor(greatest(us(col(leftStart)), us(col(rightStart))) / w))
      .drop("__b")
  }
}
