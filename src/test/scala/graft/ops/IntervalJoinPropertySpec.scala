package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property pins for the bucket-tiled interval overlap join: it must
  * produce EXACTLY the pairs of the naive all-pairs filter
  * (l.st <= r.en AND r.st <= l.en), each pair exactly once. Generators
  * stress the rewrite's failure surfaces:
  *   - endpoints at exact bucket multiples (inclusive-touch pairs)
  *   - point intervals (st == en)
  *   - intervals spanning many buckets vs sub-bucket intervals
  *   - negative epochs (floor-division bucket straddling zero)
  */
class IntervalJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private val bucketSec = 10L

  // µs timestamps on a half-bucket grid with ±1 µs jitter, negative too
  private val tsGen: Gen[Long] = for {
    halfBuckets <- Gen.choose(-4L, 4L)
    jitter <- Gen.oneOf(-1L, 0L, 1L)
  } yield halfBuckets * (bucketSec * 500000L) + jitter

  private val ivGen: Gen[(Long, Long)] = for {
    a <- tsGen; b <- tsGen
  } yield (math.min(a, b), math.max(a, b))

  private val fixtures: Gen[(Seq[(Long, Long)], Seq[(Long, Long)])] = for {
    l <- Gen.listOfN(15, ivGen)
    r <- Gen.listOfN(15, ivGen)
  } yield (l, r)

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(9090L + i)))

  test("bucket-tiled overlap join equals all-pairs filter, each pair exactly once") {
    samples(fixtures, 25).zipWithIndex.foreach { case ((ls, rs), i) =>
      val l = ls.zipWithIndex.map { case ((s, e), id) => (id.toLong, s, e) }
      val r = rs.zipWithIndex.map { case ((s, e), id) => (id.toLong, s, e) }
      val ldf = l.toDF("lid", "ls_us", "le_us")
        .select(col("lid"), timestamp_micros(col("ls_us")).as("ls"),
          timestamp_micros(col("le_us")).as("le"))
      val rdf = r.toDF("rid", "rs_us", "re_us")
        .select(col("rid"), timestamp_micros(col("rs_us")).as("rs"),
          timestamp_micros(col("re_us")).as("re"))
      val got = IntervalJoin.overlapJoin(ldf, rdf, "ls", "le", "rs", "re", bucketSec)
        .select(col("lid"), col("rid"))
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
      val want = for {
        (a, ai) <- ls.zipWithIndex; (b, bi) <- rs.zipWithIndex
        if a._1 <= b._2 && b._1 <= a._2
      } yield (ai.toLong, bi.toLong)
      assert(got.sorted == want.sorted,
        s"fixture $i: got=${got.size} want=${want.size} " +
          s"missing=${want.toSet -- got.toSet} dup/extra=${got.diff(want)}")
    }
  }

  test("extra equi keys shard the time axis") {
    val l = Seq((1L, 0L, 5000000L), (2L, 0L, 5000000L))
      .toDF("lk", "ls_us", "le_us")
      .select(col("lk"), timestamp_micros(col("ls_us")).as("ls"),
        timestamp_micros(col("le_us")).as("le"))
      .withColumn("tenant", col("lk"))
    val r = Seq((1L, 1000000L, 2000000L), (2L, 1000000L, 2000000L))
      .toDF("rk", "rs_us", "re_us")
      .select(col("rk"), timestamp_micros(col("rs_us")).as("rs"),
        timestamp_micros(col("re_us")).as("re"))
      .withColumn("tenant", col("rk"))
    val out = IntervalJoin.overlapJoin(l, r, "ls", "le", "rs", "re", 10L,
        extraKeys = Seq("tenant"))
      .select(col("lk"), col("rk")).collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(out == Set((1L, 1L), (2L, 2L)), "cross-tenant overlaps must not join")
  }
}
