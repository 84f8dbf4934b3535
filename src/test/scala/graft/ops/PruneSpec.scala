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
    val bf = Prune.bloomFor(urgent.select("o_orderkey"), "o_orderkey")
    val kept = li.filter(
      Prune.mightContain(bf, col("l_orderkey"), li.schema("l_orderkey").dataType)).count()
    val total = li.count()
    // urgent is ~1/5 of orders; with fpp=1% the survivor set must be well
    // under half the fact table for the pruning to be worth anything
    assert(kept < total / 2, s"pruned only $total -> $kept")
  }

  test("string keys probe consistently; nulls never pass") {
    val small = Seq("a", "b").toDF("k")
    val big = Seq(Some("a"), Some("zz"), None).toDF("k2")
    val bf = Prune.bloomFor(small, "k")
    val kept = big.filter(Prune.mightContain(bf, col("k2"), big.schema("k2").dataType))
      .as[Option[String]].collect().flatten.toSet
    assert(kept.contains("a") && !kept.contains(null))
    val joined = Prune.bloomPrunedJoin(big, small, "k2", "k").select("k2").as[String].collect()
    assert(joined.toSeq == Seq("a"))
  }

  test("outer join types are rejected (pruning would drop keepable rows)") {
    val df = Seq(1L).toDF("k")
    intercept[IllegalArgumentException] {
      Prune.bloomPrunedJoin(df, df, "k", "k", joinType = "left_outer")
    }
  }
}
