package graft.ops

import graft.SparkSpec

/** The 100 TB join-regime battery (VERDICT r4 §next-round #1).
  *
  * Every PlanSpec guard pins the TEST-SCALE plan, where customer/orders
  * fit under the broadcast threshold. At 100 TB only the bounded dims
  * (nation 25 rows, region 5) broadcast; everything corpus-derived must
  * demote to a keyed shuffle join. This suite runs the six join-heavy
  * inventory queries with auto-broadcast OFF (threshold=-1, the posture
  * of a cluster where no data-scaling side fits executor memory) and
  * asserts the two things that matter in that regime:
  *
  *  1. plans demote CLEANLY — SortMergeJoin / ShuffledHashJoin, never
  *     BroadcastNestedLoopJoin or CartesianProduct, with broadcast
  *     hints surviving ONLY on bounded dims
  *     ([[graft.ScaleConfig.scalingBroadcast]] withholds the
  *     data-scaling hints under this config);
  *  2. results are IDENTICAL to the broadcast-regime results — the
  *     plan change is invisible in the output.
  *
  * The driver-style oracle check under this config is produced by
  * [[graft.tools.NoBroadcastVerify]] → NOBROADCAST_r05.json.
  */
class NoBroadcastPlanSpec extends SparkSpec {

  private val queries = Seq(
    "q03_join_revenue_by_nation", "q08_semi_anti", "q18_asof_join",
    "q20_argmax_group", "q55_bloom_join", "q64_late_alone")

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(v => if (v == null) "NULL" else v.toString)
      .mkString("|")).toSeq.sorted

  private def withNoBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try body
    finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  private def finalPlan(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, sf)
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("no-broadcast regime: every join demotes to SMJ/shuffled-hash — no BNLJ, no cartesian") {
    withNoBroadcast {
      queries.foreach { q =>
        val p = finalPlan(q)
        if (q == "q55_bloom_join") {
          // round-7: the bloom filter is a ONE-row word-map DataFrame
          // attached by an explicit broadcast (the q196 codegen-probe
          // pattern) — that single-row attach is the only BNLJ allowed
          // here; it does not scale with data by construction
          assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1,
            s"q55 gained a second nested-loop join:\n$p")
        } else {
          assert(!p.contains("BroadcastNestedLoopJoin"),
            s"$q planned a nested-loop join with broadcasts off:\n$p")
        }
        assert(!p.contains("CartesianProduct"),
          s"$q planned a cartesian product with broadcasts off:\n$p")
      }
    }
  }

  test("no-broadcast regime: data-scaling sides shuffle; only bounded dims still broadcast") {
    withNoBroadcast {
      // q03: orders⋈lineitem and the custDim join are SMJ; the two
      // surviving broadcasts are the bounded nation/region chain
      val p03 = finalPlan("q03_join_revenue_by_nation")
      assert(p03.contains("SortMergeJoin") || p03.contains("ShuffledHashJoin"),
        s"q03 big joins did not demote:\n$p03")
      val bhj03 = "BroadcastHashJoin".r.findAllIn(p03).size
      assert(bhj03 <= 2, s"q03 kept $bhj03 broadcasts (only nation/region are bounded):\n$p03")
      // q08: the distinct order-key side is orders-derived — no
      // broadcast at all in this regime
      val p08 = finalPlan("q08_semi_anti")
      assert(!p08.contains("BroadcastHashJoin"),
        s"q08 still broadcasts a data-scaling side:\n$p08")
      assert(p08.contains("SortMergeJoin") || p08.contains("ShuffledHashJoin"),
        s"q08 join did not demote:\n$p08")
      // q18: the as-of join is the union+window form — no join operator
      // exists to demote, which is exactly why it survives this regime
      val p18 = finalPlan("q18_asof_join")
      assert(p18.contains("Window") && !p18.contains("Join"),
        s"q18 should stay union+window:\n$p18")
      // q55: bloom pre-filter still prunes the fact scan; the fact⋈dim
      // join demotes to a keyed shuffle join. ONE BroadcastHashJoin is
      // legal: the bloom-build densify join's word side is bounded by
      // the filter geometry (≤ mBits/64 rows), not by the data — the
      // same bounded-dim class as nation/region
      val p55 = finalPlan("q55_bloom_join")
      assert(p55.contains("SortMergeJoin") || p55.contains("ShuffledHashJoin"),
        s"q55 join did not demote:\n$p55")
      assert("BroadcastHashJoin".r.findAllIn(p55).size <= 1,
        s"q55 kept a data-scaling broadcast:\n$p55")
      // q64: both self-aggregation joins demote to keyed shuffles
      val p64 = finalPlan("q64_late_alone")
      assert(p64.contains("SortMergeJoin") || p64.contains("ShuffledHashJoin"),
        s"q64 joins did not demote:\n$p64")
    }
  }

  test("no-broadcast regime: results are identical to the broadcast-regime results") {
    val expected = queries.map(q =>
      q -> canon(graft.SparkEntry.queries(q)(spark, sf))).toMap
    withNoBroadcast {
      queries.foreach { q =>
        val got = canon(graft.SparkEntry.queries(q)(spark, sf))
        assert(got == expected(q),
          s"$q result changed under the no-broadcast config")
      }
    }
  }

  test("broadcast regime is restored after the battery (hint gate reads live conf)") {
    // scalingBroadcast must re-apply the hint once broadcasts are legal
    // again — the gate is a planning-time read, not captured state
    val p = finalPlan("q03_join_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"),
      s"q03 lost its bench-scale broadcasts after the battery:\n$p")
  }
}
