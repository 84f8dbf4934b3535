package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins for the z-order clustered writer: the Morton interleave itself,
  * and the property the layout exists for — per-file footer min/max
  * stats stay tight on BOTH clustered dimensions, so a box predicate
  * prunes files on either column, where a single-key sort prunes on
  * its key only.
  */
class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  test("zorderColumn: interleave is the Morton curve on a known grid") {
    initQuiet()
    // 2 bits per dim over a 4x4 grid: z(x,y) with x in bit 0,2 / y in bit 1,3
    val df = (for (x <- 0 to 3; y <- 0 to 3) yield (x, y)).toDF("x", "y")
    val out = IO.zorderColumn(df, Seq("x", "y"), bits = 2)
      .select(col("x"), col("y"), col("__z")).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    def morton(x: Int, y: Int): Long =
      (0 until 2).map(i => (((x >> i) & 1).toLong << (2 * i)) |
        (((y >> i) & 1).toLong << (2 * i + 1))).reduce(_ | _)
    for (x <- 0 to 3; y <- 0 to 3)
      assert(out((x, y)) == morton(x, y), s"z($x,$y)")
  }

  test("zorderColumn: constant column degrades to rank 0, not a crash") {
    initQuiet()
    val df = Seq((1, 5), (2, 5), (3, 5)).toDF("a", "b")
    val zs = IO.zorderColumn(df, Seq("a", "b")).select("__z").collect().map(_.getLong(0))
    assert(zs.length == 3 && zs.distinct.length == 3) // a still discriminates
  }

  /** Per-file [min,max] of `c` in a written layout. */
  private def fileStats(path: String, c: String): Array[(Long, Long)] =
    spark.read.parquet(path)
      .groupBy(input_file_name()).agg(min(col(c)).as("lo"), max(col(c)).as("hi"))
      .select(col("lo").cast("long"), col("hi").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))

  /** Files whose [lo,hi] intersects [qLo,qHi] — what footer pruning reads. */
  private def touched(stats: Array[(Long, Long)], qLo: Long, qHi: Long): Int =
    stats.count { case (lo, hi) => hi >= qLo && lo <= qHi }

  test("writeZOrdered: box predicates prune files on BOTH dims; single-key sort only on its own") {
    initQuiet()
    val li = graft.Tables.load(spark, sf, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString
    val sDir = java.nio.file.Files.createTempDirectory("singlesort").toString
    val nFiles = 16
    IO.writeZOrdered(li, zDir, nFiles, Seq("l_partkey", "l_suppkey"))
    IO.writeSorted(li, sDir, nFiles, "l_partkey")

    val bounds = li.agg(
      min("l_partkey"), max("l_partkey"), min("l_suppkey"), max("l_suppkey")).head()
    val (pLo, pHi) = (bounds.getLong(0), bounds.getLong(1))
    val (sLo, sHi) = (bounds.getLong(2), bounds.getLong(3))
    // a quarter-range box on each dimension
    def quarter(lo: Long, hi: Long): (Long, Long) = (lo, lo + (hi - lo) / 4)
    val (qpLo, qpHi) = quarter(pLo, pHi)
    val (qsLo, qsHi) = quarter(sLo, sHi)

    val zPart = touched(fileStats(zDir, "l_partkey"), qpLo, qpHi)
    val zSupp = touched(fileStats(zDir, "l_suppkey"), qsLo, qsHi)
    val sPart = touched(fileStats(sDir, "l_partkey"), qpLo, qpHi)
    val sSupp = touched(fileStats(sDir, "l_suppkey"), qsLo, qsHi)

    // single-key sort: perfect on its key, blind on the other
    assert(sPart <= nFiles / 2, s"partkey-sorted layout should prune partkey boxes: $sPart")
    assert(sSupp >= nFiles - 1, s"partkey sort cannot prune suppkey boxes: $sSupp")
    // z-order: real pruning on BOTH dimensions
    assert(zPart <= nFiles * 3 / 4, s"z-order should prune partkey boxes: $zPart")
    assert(zSupp <= nFiles * 3 / 4, s"z-order should prune suppkey boxes: $zSupp")
    assert(zSupp < sSupp, "z-order must beat single-key sort on the second dim")
  }
}
