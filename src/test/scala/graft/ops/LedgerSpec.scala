package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computable pins for FIFO lot matching (q178). */
class LedgerSpec extends SparkSpec {

  import spark.implicits._

  private def lots(rows: (Long, Int, Long)*) = // (key, seq, qty)
    rows.toDF("k", "seq", "qty")

  test("fifoMatch: demand slices consume lots strictly in sequence order") {
    initQuiet()
    // supply lots: 5 then 10; demands: 3, 4, 8
    // FIFO: d1=3 from lot1; d2 = 2 from lot1 + 2 from lot2; d3 = 8 from lot2
    val out = Ledger.fifoMatch(
      lots((1L, 1, 5L), (1L, 2, 10L)),
      lots((1L, 1, 3L), (1L, 2, 4L), (1L, 3, 8L)),
      "k", "qty", Seq("seq")).collect()
      .map(r => (r.getAs[org.apache.spark.sql.Row]("supply").getAs[Int]("seq"),
        r.getAs[org.apache.spark.sql.Row]("demand").getAs[Int]("seq"),
        r.getAs[Long]("matched_qty"))).toSet
    assert(out == Set((1, 1, 3L), (1, 2, 2L), (2, 2, 2L), (2, 3, 8L)))
  }

  test("fifoMatch: excess demand beyond total supply is simply unmatched") {
    initQuiet()
    val out = Ledger.fifoMatch(
      lots((1L, 1, 4L)), lots((1L, 1, 10L)), "k", "qty", Seq("seq"))
      .agg(sum("matched_qty")).as[Long].head()
    assert(out == 4L)
  }

  test("fifoMatch: keys never cross-match") {
    initQuiet()
    val out = Ledger.fifoMatch(
      lots((1L, 1, 5L)), lots((2L, 1, 5L)), "k", "qty", Seq("seq"))
    assert(out.count() == 0)
  }

  test("cappedBalanceQuery: clamp histogram masses reconcile to the user count") {
    initQuiet()
    val rows = Ledger.cappedBalanceQuery(spark, sf).collect()
    assert(rows.nonEmpty)
    val users = graft.Tables.load(spark, sf, "events")
      .filter(col("event_type").isin("purchase", "error"))
      .select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == users)
    rows.foreach { r =>
      val b = r.getAs[Long]("bal_bucket")
      assert(b >= 0 && b <= 10) // cap 20000 cents / 2000-cent buckets
    }
  }

  test("clamp fold: hand-computed saturation path") {
    initQuiet()
    // deltas +150, +100 (clamps at 200), -250 (clamps at 0), +50:
    // bal: 150 -> 200 (nh=1) -> 0 (nl=1) -> 50
    val df = Seq((1L, 1L, 1L, 15000L), (1L, 2L, 2L, 10000L),
      (1L, 3L, 3L, -25000L), (1L, 4L, 4L, 5000L))
      .toDF("user_id", "sec", "event_id", "d")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"),
        col("event_id"), col("d"))
    val st = df.groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("ts"), col("event_id"),
        col("d")))).as("__evs"))
      .withColumn("__st", expr(
        """aggregate(__evs, named_struct('bal', 0L, 'nh', 0L, 'nl', 0L),
          |  (a, x) -> named_struct(
          |    'bal', least(20000L, greatest(0L, a.bal + x.d)),
          |    'nh', a.nh + IF(a.bal + x.d > 20000L, 1L, 0L),
          |    'nl', a.nl + IF(a.bal + x.d < 0L, 1L, 0L)))""".stripMargin))
      .select("__st.bal", "__st.nh", "__st.nl").head()
    assert((st.getLong(0), st.getLong(1), st.getLong(2)) == ((5000L, 1L, 1L)))
  }

  test("fifoCostingQuery: brand rows cover every demanded part; fill_rate ≤ 1") {
    initQuiet()
    val out = Ledger.fifoCostingQuery(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val fill = r.getAs[Double]("fill_rate")
      assert(fill >= 0.0 && fill <= 1.0)
      assert(r.getAs[Long]("matched_qty") <= r.getAs[Long]("demand_qty"))
    }
  }

  test("unitValueIndexQuery: index consistent with per-year unit values") {
    initQuiet()
    val rows = Ledger.unitValueIndexQuery(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (u96, u97) = (r.getAs[Double]("unit_value_96"),
        r.getAs[Double]("unit_value_97"))
      val idx = r.getAs[Double]("uv_index")
      assert(u96 > 0 && u97 > 0 && idx > 0)
      assert(r.getAs[Long]("n_common_parts") > 0)
      // the exact index equals the unit-value ratio up to the 1e-4
      // floor quantization of the reported unit values
      assert(math.abs(idx - u97 / u96) < 1e-2, s"$idx vs ${u97 / u96}")
    }
  }

  test("endingInventory: matched + remaining conserve supplied, per brand") {
    initQuiet()
    val inv = Ledger.endingInventoryQuery(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("supplied_qty"), r.getAs[Long]("remaining_qty"))).toMap
    val cogs = Ledger.fifoCostingQuery(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("matched_qty")).toMap
    assert(inv.nonEmpty)
    inv.foreach { case (brand, (supplied, remaining)) =>
      assert(remaining >= 0 && remaining <= supplied)
      // q178's matched quantity is the exact complement of remaining
      assert(cogs.getOrElse(brand, 0L) + remaining === supplied,
        s"$brand: ${cogs.getOrElse(brand, 0L)} + $remaining != $supplied")
    }
  }
}
