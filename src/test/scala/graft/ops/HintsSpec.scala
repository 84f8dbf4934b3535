package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The cardinality-guarded broadcast hint (round-8, VERDICT r7 #3):
  * under the bound the hint is applied; over it the hint is DROPPED so
  * the planner/AQE picks a strategy that survives unbounded key
  * cardinality — exercised both at the helper and through a real
  * operator plan. */
class HintsSpec extends SparkSpec {

  import spark.implicits._

  test("keyIsBounded: under-bound true, over-bound false (shaded 10%)") {
    initQuiet()
    val keys = (1L to 2000L).toDF("k")
    assert(Hints.keyIsBounded(keys, col("k"), maxKeys = 10000L))
    assert(!Hints.keyIsBounded(keys, col("k"), maxKeys = 2000L),
      "2000 keys against maxKeys=2000 must fail the 90% shaded bound " +
        "(sketch error must never route an over-bound relation to broadcast)")
  }

  private def hasHint(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.analyzed.collectFirst {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }.nonEmpty

  test("broadcastIfBounded: hint present under bound, absent over bound") {
    initQuiet()
    val keys = (1L to 500L).toDF("k")
    val smallAgg = keys.groupBy(col("k")).agg(count(lit(1)).as("c"))
    assert(hasHint(
      Hints.broadcastIfBounded(smallAgg, keys, col("k"), 10000L).join(keys, "k")))
    assert(!hasHint(
      Hints.broadcastIfBounded(smallAgg, keys, col("k"), 100L).join(keys, "k")))
  }

  test("cusumChangepoints over-bound path: hint dropped, the planner " +
    "(not the hint) picks the strategy, output identical") {
    initQuiet()
    // 3 series keys, bounded — baseline result with the hint applied
    val df = Seq(
      ("a", 1, 10L), ("a", 2, 12L), ("a", 3, 30L), ("a", 4, 31L),
      ("b", 1, 5L), ("b", 2, 5L), ("b", 3, 5L),
      ("c", 1, 1L), ("c", 2, 9L)).toDF("k", "p", "v")
    val base = Drift.cusumChangepoints(df, "k", "p", "v")
      .orderBy("k").collect().map(_.toString)
    // the join Drift would build, minus the hint (over-bound decision):
    // with auto-broadcast disabled, the absence of the hint must leave a
    // NON-broadcast join — proving the hint, not the planner's own size
    // estimate, was the only broadcast forcer
    val stats = df.groupBy(col("k")).agg(count(lit(1)).as("__n"))
    val demoted = df.join(Hints.broadcastIfBounded(stats, df, col("k"), 2L), "k")
    assert(!hasHint(demoted), "over-bound path must drop the hint")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = demoted.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"without the hint and auto-broadcast the join must demote:\n$plan")
      assert(demoted.count() == df.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // and the bounded operator output is stable
    val again = Drift.cusumChangepoints(df, "k", "p", "v")
      .orderBy("k").collect().map(_.toString)
    assert(base.sameElements(again))
  }

  test("itemCosine: duplicate (entity, item) rows pre-aggregate — " +
    "no self-pairs, dot matches the summed interaction") {
    initQuiet()
    // duplicates: entity 1 interacts with A twice (2 + 3 = 5)
    val dup = Seq((1L, "A", 2L), (1L, "A", 3L), (1L, "B", 1L),
      (2L, "A", 1L), (2L, "B", 4L)).toDF("e", "i", "n")
    val out = Recommend.itemCosine(dup, "e", "i", "n").collect()
    assert(out.forall(r => r.getString(0) != r.getString(1)),
      "self-pairs must never appear, even on duplicate input")
    assert(out.length == 1)
    val r = out.head
    // dot(A,B) = 5*1 + 1*4 = 9 ; |A|^2 = 25 + 1 = 26 ; |B|^2 = 1 + 16 = 17
    assert(r.getLong(3) == 9L)
    assert(r.getDouble(4) ==
      math.rint(9.0 / math.sqrt(26.0 * 17.0) * 1e6) / 1e6)
    // equivalent to pre-summed unique input
    val uniq = Seq((1L, "A", 5L), (1L, "B", 1L), (2L, "A", 1L),
      (2L, "B", 4L)).toDF("e", "i", "n")
    val expect = Recommend.itemCosine(uniq, "e", "i", "n").collect()
    assert(out.map(_.toString).sameElements(expect.map(_.toString)))
  }
}
