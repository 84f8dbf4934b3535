package graft.ops

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property pin for [[Drift.ksLeaveOneOut]]: the 2·|values|-candidate
  * evaluation (at / just-before each group value) must equal the
  * brute-force max of |F_g − F_rest| over the FULL merged value grid,
  * for every fixture. Generators stress the reduction's failure
  * surfaces:
  *   - heavy ties (values drawn from a tiny support, so group and
  *     rest step at the same points)
  *   - groups whose values cluster at one end (the max then falls
  *     strictly BETWEEN group values — only the lagged candidate
  *     sees it)
  *   - singleton groups and groups holding most of the table
  */
class KsPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rowGen: Gen[(String, Long)] = for {
    g <- Gen.oneOf("a", "b", "c")
    v <- Gen.choose(0L, 7L)
  } yield (g, v)

  private val fixtures: Gen[List[(String, Long)]] =
    Gen.listOf(rowGen).map(_.take(40)).suchThat { rows =>
      // leave-one-out needs at least two groups present
      rows.map(_._1).distinct.size >= 2
    }

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(4242L + i)))

  private def bruteForce(rows: Seq[(String, Long)]): Map[String, Double] = {
    val n = rows.size.toLong
    val grid = rows.map(_._2).distinct.sorted
    rows.groupBy(_._1).map { case (g, own) =>
      val ns = own.size.toLong
      val nr = n - ns
      val d = grid.map { v =>
        val ca = own.count(_._2 <= v).toLong
        val ct = rows.count(_._2 <= v).toLong
        math.abs(ca * nr - (ct - ca) * ns)
      }.max
      g -> BigDecimal(d.toDouble / (ns * nr).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
  }

  test("candidate-set KS equals brute force over the merged grid") {
    initQuiet()
    samples(fixtures, 60).zipWithIndex.foreach { case (rows, i) =>
      val df = rows.toDF("g", "v")
      val got = Drift.ksLeaveOneOut(df, "g", "v").collect()
        .map(r => r.getString(0) -> r.getDouble(3)).toMap
      val want = bruteForce(rows)
      assert(got == want, s"fixture $i: got=$got want=$want rows=$rows")
    }
  }

  private def bruteForceAuc(rows: Seq[(String, Long)]): Map[String, Double] =
    rows.groupBy(_._1).map { case (g, own) =>
      val rest = rows.filterNot(_._1 == g)
      // AUC = (wins + half the ties) over all cross pairs
      val num2 = (for { (_, x) <- own; (_, y) <- rest } yield
        if (x > y) 2L else if (x == y) 1L else 0L).sum
      g -> BigDecimal(num2.toDouble / (2.0 * own.size * rest.size))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }

  test("doubled-midrank AUC equals the all-pairs win/tie count") {
    initQuiet()
    samples(fixtures, 60).zipWithIndex.foreach { case (rows, i) =>
      val df = rows.toDF("g", "v")
      val got = Drift.rankBiasLeaveOneOut(df, "g", "v").collect()
        .map(r => r.getString(0) -> r.getDouble(3)).toMap
      val want = bruteForceAuc(rows)
      assert(got == want, s"fixture $i: got=$got want=$want rows=$rows")
    }
  }
}
