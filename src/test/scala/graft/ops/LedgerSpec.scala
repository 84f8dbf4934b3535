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
}
