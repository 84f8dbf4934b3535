package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q158–q162 — the TPC-H decorrelation battery (Q2/Q17/Q15/Q22/Q18
  * shapes). Each pin replays the textbook correlated formulation
  * brute-force on the sf0.001 corpus and checks the decorrelated
  * join plan reproduces it exactly; the DuckDB oracle is the full
  * cross-engine gate, these pins catch rewrite mistakes locally.
  */
class TpchShapesSpec extends SparkSpec {

  test("q158: every row is a true per-part minimum, ties kept") {
    val rows = Relational.q158(spark, sf).collect()
    assert(rows.nonEmpty)
    // brute-force per-part min over size-10 parts
    val li = Tables.load(spark, sf, "lineitem")
      .join(Tables.load(spark, sf, "part").filter(col("p_size") === 10),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"),
        round(col("l_extendedprice") * 100).cast("long").as("pc"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mins = li.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
    rows.foreach { r =>
      val pk = r.getLong(0)
      val price = math.round(r.getDouble(3) * 100)
      assert(mins(pk) == price, s"part $pk: ${mins(pk)} vs $price")
    }
  }

  test("q159: integer threshold equals the 0.2*avg rule on exact cents") {
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_partkey"),
        round(col("l_quantity") * 100).cast("long").as("qc"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byPart = li.groupBy(_._1)
    val expected = li.count { case (pk, qc) =>
      val g = byPart(pk); qc * 5 * g.size < g.map(_._2).sum
    }
    val got = Relational.q159(spark, sf)
      .agg(sum(col("n_small"))).head.getLong(0)
    assert(got == expected && expected > 0)
  }

  test("q160: emitted suppliers all share the global max revenue") {
    val rows = Relational.q160(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getDouble(2)).distinct.length == 1)
  }

  test("q161: no selected customer has an order on/after the cutoff") {
    val out = Relational.q161(spark, sf)
    assert(out.agg(sum(col("n_cust"))).head.getLong(0) > 0)
    // recompute the qualifying set and intersect with recent orderers
    val cust = Tables.load(spark, sf, "customer")
      .select(col("c_custkey"),
        round(col("c_acctbal") * 100).cast("long").as("bc"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pos = cust.filter(_._2 > 0)
    val (n, s) = (pos.length.toLong, pos.map(_._2).sum)
    val rich = cust.filter { case (_, b) => b * n > s }.map(_._1).toSet
    val recent = Tables.load(spark, sf, "orders")
      .filter(col("o_orderdate") >= to_timestamp(lit("2000-01-01")))
      .select(col("o_custkey")).distinct()
      .collect().map(_.getLong(0)).toSet
    val expected = (rich -- recent).size.toLong
    assert(out.agg(sum(col("n_cust"))).head.getLong(0) == expected)
  }

  test("q162: totals exceed 250 units and descend") {
    val rows = Relational.q162(spark, sf).collect()
    assert(rows.nonEmpty)
    val qtys = rows.map(_.getDouble(4))
    assert(qtys.forall(_ > 250.0))
    assert(qtys.sameElements(qtys.sortBy(-_)))
  }
}
