package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom-pruned join: result-exactness, actual pruning, guardrails. */
class PruneSpec extends SparkSpec {
  import spark.implicits._

  test("bloomPrunedJoin ≡ plain inner join (no false negatives; FPs die in the join)") {
    initQuiet()
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val urgent = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
    val pruned = Prune.bloomPrunedJoin(li, urgent, "l_orderkey", "o_orderkey")
      .select(col("l_orderkey"), col("l_linenumber"), col("o_custkey"))
    val plain = li.join(urgent, li("l_orderkey") === urgent("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("o_custkey"))
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("bloom pre-filter actually prunes the big side") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val urgent = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
    val kf = Prune.bloomFor(urgent.select("o_orderkey"), "o_orderkey")
    val kept = kf.pruned(li, "l_orderkey").count()
    val total = li.count()
    // urgent is ~1/5 of orders; with fpp=1% the survivor set must be well
    // under half the fact table for the pruning to be worth anything
    assert(kept < total / 2, s"pruned only $total -> $kept")
  }

  test("string keys probe consistently; nulls never pass") {
    val small = Seq("a", "b").toDF("k")
    val big = Seq(Some("a"), Some("zz"), None).toDF("k2")
    val kf = Prune.bloomFor(small, "k")
    val kept = kf.pruned(big, "k2")
      .as[Option[String]].collect().flatten.toSet
    assert(kept.contains("a") && !kept.contains(null))
    val joined = Prune.bloomPrunedJoin(big, small, "k2", "k").select("k2").as[String].collect()
    assert(joined.toSeq == Seq("a"))
  }

  test("int fact key probes a filter built from long dim keys (width-normalized hashing)") {
    val small = Seq(1L, 2L, 3L).toDF("k")
    val big = Seq(1, 3, 999999).toDF("k2") // IntegerType on purpose
    val joined = Prune.bloomPrunedJoin(big, small, "k2", "k")
      .select("k2").as[Int].collect().toSet
    assert(joined == Set(1, 3))
  }

  test("the probe plan is codegen'd — no scalar UDF node") {
    val small = Seq(1L, 2L).toDF("k")
    val big = Seq(1L, 5L).toDF("k2")
    val kf = Prune.bloomFor(small, "k")
    val plan = kf.pruned(big, "k2").queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("scalaudf"),
      s"UDF node in bloom probe plan:\n$plan")
  }

  test("outer join types are rejected (pruning would drop keepable rows)") {
    val df = Seq(1L).toDF("k")
    intercept[IllegalArgumentException] {
      Prune.bloomPrunedJoin(df, df, "k", "k", joinType = "left_outer")
    }
  }
}
