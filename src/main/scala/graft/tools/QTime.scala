package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer for scale-fix verification: runs the named
  * registry queries against a corpus dir under the cluster posture
  * (AQE on — [[graft.ScaleConfig.cluster]]), one warm-up pass then one
  * timed pass each, and prints seconds + row counts.
  *
  * Run: `sbt "runMain graft.tools.QTime <dir> <q1> [q2 ...]"`.
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.ScaleConfig.cluster(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.names.foreach(n => Tables.load(spark, dir, n).persist().count())
    // burn-in: absorb the cache-materialization eviction/GC churn before
    // anything is timed (the ScaleCheck discipline — without it the
    // first query reads 2-10x its steady-state time at 100x)
    Tables.names.foreach(n => Tables.load(spark, dir, n).count())
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, dir).collect() // warm: codegen + cache
      val t0 = System.nanoTime()
      val rows = fn(spark, dir).collect().length
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$rows")
    }
    spark.stop()
  }
}
