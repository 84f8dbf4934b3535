package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins for [[Bloom]]: the no-false-negative contract (what makes
  * prefilter + exact join result-identical to the plain join) and a
  * measured false-positive rate on disjoint keys.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val M = 1 << 14 // 16384 bits
  private val K = 3

  test("bloom probe: every build key is a member (no false negatives)") {
    initQuiet()
    val keys = (1L to 2000L).map(_ * 7919L) // arbitrary non-contiguous keys
    val bf = Bloom.build(keys.toDF("k"), "k", M, K)
    val misses = keys.toDF("k").crossJoin(broadcast(bf))
      .filter(!Bloom.mightContain(col("bf"), col("k"), M, K))
      .count()
    assert(misses === 0L)
  }

  test("bloom probe: disjoint keys pass at <= a few percent (measured FPP)") {
    initQuiet()
    val build = (1L to 1000L).toDF("k")
    val bf = Bloom.build(build, "k", M, K)
    // 10k probe keys disjoint from the build range
    val probes = (1_000_001L to 1_010_000L).toDF("k")
    val fp = probes.crossJoin(broadcast(bf))
      .filter(Bloom.mightContain(col("bf"), col("k"), M, K))
      .count()
    // theoretical FPP at n=1000, m=16384, k=3 is ~0.4%; allow 5x headroom
    assert(fp <= 200L, s"false positive count $fp out of 10000 probes")
  }

  test("q196: bloom-prefiltered join equals the plain join on the corpus") {
    initQuiet()
    val viaBloom = Bloom.query(spark, sf).collect().map(_.toString).sorted
    val cust = graft.Tables.load(spark, sf, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val plain = graft.Tables.load(spark, sf, "orders")
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(round(col("o_totalprice") * 100).cast("long")) / 100.0, 2)
          .as("revenue"))
      .orderBy(col("o_orderpriority")).collect().map(_.toString).sorted
    assert(viaBloom.toSeq === plain.toSeq)
  }

  test("bloom filter is a dense word array: exactly mBits/64 longs, <=150 set") {
    initQuiet()
    // round-7: dense array<long> (O(1) positional probes) replaced the
    // sparse map (whose element_at is a linear entry scan — a measured
    // scale hang at 550k words x 7 probes x 60M rows on q55)
    val row = Bloom.build((1L to 50L).toDF("k"), "k", M, K)
      .select(size(col("bf")).as("n"),
        size(filter(col("bf"), w => w =!= 0L)).as("set"))
      .head()
    assert(row.getInt(0) == M / 64, s"array must be dense: ${row.getInt(0)}")
    // 50 keys x 3 hashes set at most 150 distinct words
    assert(row.getInt(1) <= 150 && row.getInt(1) > 0)
  }
}
