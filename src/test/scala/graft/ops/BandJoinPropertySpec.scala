package graft.ops

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property pins for the banded range join (SURVEY §2.3 A8): the
  * bucket-probe rewrite (equi join on (key, time-bucket) with ±1 probe)
  * must produce EXACTLY the pairs of the naive all-pairs filter
  * |l.ts − r.ts| <= band, for every fixture. Generators deliberately
  * stress the rewrite's failure surfaces:
  *   - timestamps at exact band multiples (boundary pairs are INCLUSIVE)
  *   - pairs one microsecond outside the band (via sub-second offsets)
  *   - negative epochs: long division truncates toward zero, so the
  *     bucket straddling zero is double-width — the ±1 probe must still
  *     cover every in-band pair
  */
class BandJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private val bandSec = 10L

  private case class Fixture(
      left: Seq[(Long, Long)],   // (key, ts micros)
      right: Seq[(Long, Long)])

  // grid: multiples of a half-band plus a tiny jitter from {-1, 0, +1} µs,
  // spanning negative and positive epochs
  private val tsGen: Gen[Long] = for {
    halfBands <- Gen.choose(-4L, 4L)
    jitter <- Gen.oneOf(-1L, 0L, 1L)
  } yield halfBands * (bandSec * 500000L) + jitter

  private val fixtures: Gen[Fixture] = for {
    l <- Gen.listOf(Gen.zip(Gen.choose(1L, 3L), tsGen))
    r <- Gen.listOf(Gen.zip(Gen.choose(1L, 3L), tsGen))
  } yield Fixture(l.take(20), r.take(20))

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(777L + i)))

  test("bucket-probe band join equals the all-pairs filter on boundary-heavy fixtures") {
    samples(fixtures, 40).zipWithIndex.foreach { case (fx, i) =>
      import org.apache.spark.sql.functions.expr
      val l = fx.left.zipWithIndex
        .map { case ((k, us), id) => (k, id.toLong, us) }
        .toDF("k", "lid", "lus")
        .withColumn("lts", expr("timestamp_micros(lus)")).drop("lus")
      val r = fx.right.zipWithIndex
        .map { case ((k, us), id) => (k, id.toLong, us) }
        .toDF("k", "rid", "rus")
        .withColumn("rts", expr("timestamp_micros(rus)")).drop("rus")
      val got = Analytics.bandJoin(l, r, Seq("k"), "lts", "rts", bandSec)
        .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val want = (for {
        ((lk, lus), lid) <- fx.left.zipWithIndex
        ((rk, rus), rid) <- fx.right.zipWithIndex
        if lk == rk && math.abs(lus - rus) <= bandSec * 1000000L
      } yield (lid.toLong, rid.toLong)).toSet
      assert(got == want,
        s"fixture $i: missing=${want -- got} extra=${got -- want}\n fx=$fx")
    }
  }
}
