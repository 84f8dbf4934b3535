package graft.ops

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property pins for AsOfJoin's tie/null semantics (VERDICT r5 §8): the
  * derived operator's contract lives only in tests, so randomized
  * tie-heavy fixtures are compared against a REFERENCE per-key linear
  * scan implementing the declared semantics verbatim:
  *
  *   backward: match = the right row with the LARGEST rt <= lt
  *   forward:  match = the right row with the SMALLEST rt >= lt
  *   ties:     rt == lt matches in both directions (inclusive boundary,
  *             DuckDB `ASOF JOIN ... ON l.ts >= r.ts` semantics)
  *   nulls:    null rt never matches; null lt keeps the row, null match
  *   tolerance: |lt - rt| > tol nulls the match, keeps the row
  *
  * Timestamps are drawn from a deliberately tiny grid (0..12 s) so
  * duplicate timestamps across AND within sides are the common case,
  * not the corner case. Right rows are unique per (key, ts) — with
  * duplicates the carried payload is ambiguous in any engine.
  */
class AsOfJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Long) = new java.sql.Timestamp(s * 1000)

  private case class Fixture(
      left: Seq[(Long, Option[Long])],          // (key, ts-seconds)
      right: Seq[(Long, Long, Double)])         // (key, ts-seconds, px) — unique (key, ts)

  private val fixtures: Gen[Fixture] = for {
    nLeft <- Gen.choose(0, 25)
    left <- Gen.listOfN(nLeft, for {
      k <- Gen.choose(1L, 3L)
      ts <- Gen.frequency(9 -> Gen.choose(0L, 12L).map(Some(_)), 1 -> Gen.const(None))
    } yield (k, ts))
    rightKeys <- Gen.listOf(Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 12L)))
  } yield Fixture(
    left,
    rightKeys.distinct.map { case (k, ts) => (k, ts, (k * 100 + ts).toDouble) })

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1234L + i)))

  /** The reference scan: the declared semantics, executed naively. */
  private def reference(fx: Fixture, direction: String,
      tol: Option[Long]): Seq[(Long, Option[Long], Option[Double])] =
    fx.left.map { case (k, lts) =>
      val m = lts.flatMap { lt =>
        val cands = fx.right.filter(_._1 == k)
        val best = direction match {
          case "backward" => cands.filter(_._2 <= lt).sortBy(_._2).lastOption
          case "forward"  => cands.filter(_._2 >= lt).sortBy(_._2).headOption
        }
        best.filter(b => tol.forall(w => math.abs(lt - b._2) <= w)).map(_._3)
      }
      (k, lts, m)
    }

  private def run(fx: Fixture, direction: String,
      tol: Option[Long]): Seq[(Long, Option[Long], Option[Double])] = {
    val left = fx.left.map { case (k, ts) => (k, ts.map(t).orNull) }
      .toDF("k", "ts")
    val right = fx.right.map { case (k, ts, px) => (k, t(ts), px) }
      .toDF("k", "rts", "px")
    AsOfJoin(left, right, Seq("k"), "ts", "rts", Seq("px" -> "px"),
        direction = direction, toleranceSeconds = tol)
      .collect()
      .map(r => (
        r.getLong(0),
        Option(r.getTimestamp(1)).map(_.getTime / 1000),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toSeq
  }

  private def check(direction: String, tol: Option[Long]): Unit =
    samples(fixtures, 40).zipWithIndex.foreach { case (fx, i) =>
      val got = run(fx, direction, tol).sorted
      val want = reference(fx, direction, tol).sorted
      assert(got == want,
        s"fixture $i ($direction, tol=$tol):\n got $got\n want $want\n fx=$fx")
    }

  test("backward matches the reference scan on tie-heavy randomized fixtures") {
    check("backward", None)
  }

  test("forward matches the reference scan on tie-heavy randomized fixtures") {
    check("forward", None)
  }

  test("tolerance nulls far matches identically to the reference") {
    check("backward", Some(2L))
    check("forward", Some(2L))
  }

  test("null-ts right rows never match; empty right side keeps all left rows") {
    val left = Seq((1L, t(5)), (1L, t(9))).toDF("k", "ts")
    val rightNull = Seq((1L, Option.empty[java.sql.Timestamp], 7.0))
      .toDF("k", "rts", "px")
    val out = AsOfJoin(left, rightNull, Seq("k"), "ts", "rts", Seq("px" -> "px"))
      .collect()
    assert(out.length == 2 && out.forall(_.isNullAt(2)),
      "null-ts right row leaked into a match")

    val rightEmpty = Seq.empty[(Long, java.sql.Timestamp, Double)]
      .toDF("k", "rts", "px")
    val out2 = AsOfJoin(left, rightEmpty, Seq("k"), "ts", "rts", Seq("px" -> "px"))
      .collect()
    assert(out2.length == 2 && out2.forall(_.isNullAt(2)))
  }
}
