package graft.ops

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Long) = new java.sql.Timestamp(s * 1000)

  private lazy val trades = Seq(
    (1L, t(100), "T1"), (1L, t(200), "T2"), (2L, t(150), "T3"))
    .toDF("k", "ts", "trade")
  private lazy val quotes = Seq(
    (1L, t(90), 10.0), (1L, t(100), 11.0), (1L, t(180), 12.0),
    (2L, t(500), 99.0))
    .toDF("k", "qts", "px")

  test("backward: latest quote at or before each trade; no match -> null") {
    val out = AsOfJoin(trades, quotes, Seq("k"), "ts", "qts", Seq("px" -> "px"))
      .orderBy("k", "ts").collect()
    // ts=100 matches the quote AT 100 (<= semantics), not 90
    assert(out(0).getDouble(3) == 11.0)
    assert(out(1).getDouble(3) == 12.0)
    assert(out(2).isNullAt(3)) // k=2 has no quote <= 150
  }

  test("forward: earliest quote at or after each trade") {
    val out = AsOfJoin(trades, quotes, Seq("k"), "ts", "qts", Seq("px" -> "px"),
        direction = "forward")
      .orderBy("k", "ts").collect()
    assert(out(0).getDouble(3) == 11.0) // at-or-after 100 -> quote at 100
    assert(out(1).isNullAt(3))          // no k=1 quote >= 200
    assert(out(2).getDouble(3) == 99.0) // k=2 quote at 500
  }

  test("tolerance nulls matches farther than the window") {
    val out = AsOfJoin(trades, quotes, Seq("k"), "ts", "qts", Seq("px" -> "px"),
        toleranceSeconds = Some(10))
      .orderBy("k", "ts").collect()
    assert(out(0).getDouble(3) == 11.0) // gap 0 <= 10
    assert(out(1).isNullAt(3))          // gap 20 > 10 -> nulled
    assert(out(2).isNullAt(3))
  }

  test("left rows and columns are preserved exactly") {
    val out = AsOfJoin(trades, quotes, Seq("k"), "ts", "qts", Seq("px" -> "px"))
    assert(out.count() == 3)
    assert(out.columns.toSeq == Seq("k", "ts", "trade", "px"))
  }
}
