package graft.tools

import graft.{Bench, SparkEntry, Tables}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Standing AMPLIFIED bench (VERDICT r6 §next-round #8): the 20
  * headline queries on the 10×-amplified corpus under the CLUSTER
  * posture, as a fixed per-round artifact (BENCHAMP_r*.json).
  *
  * Why it exists: at sf0.1 most headline queries sit on the ~40-100 ms
  * local-mode dispatch floor (BENCH_NOTES.md), so a real plan
  * regression that doubles a query's compute is INVISIBLE in
  * BENCH_r*.json — it moves 30 ms inside ±2× VM noise. At 10× the
  * rows, shuffle-bound queries run 0.5–3 s where a 2× regression is an
  * unmissable signal. This artifact is the round-over-round perf
  * comparison that BENCH (the baseline-comparison artifact) cannot be.
  *
  * FIXED protocol (do not vary across rounds — comparability is the
  * point): 10× Amplify corpus, cluster posture ([[graft.ScaleConfig]]:
  * AQE + coalesce + skew-join) at shuffle.partitions=64, all tables
  * persisted before timing, 2 warm-up passes, 5 timed passes,
  * per-query MEDIANS. Same fault isolation as Bench: a broken query
  * is one red cell, never a dead artifact.
  *
  * Run: `sbt "runMain graft.tools.BenchAmp [ampDir] [outJson]"`.
  */
object BenchAmp {
  def main(args: Array[String]): Unit = {
    val ampDir = if (args.nonEmpty) args(0) else "/tmp/amp10"
    val outJson = if (args.length > 1) args(1) else "/tmp/benchamp.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.ScaleConfig.cluster(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    Tables.names.foreach { n =>
      try Tables.load(spark, ampDir, n).persist().count()
      catch { case e: Throwable =>
        System.err.println(s"[benchamp] load $n failed: ${e.getMessage}")
      }
    }

    val allNames = Bench.headlineNames
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def runPass(names: Seq[String]): Map[String, Double] =
      names.flatMap { name =>
        val t0 = System.nanoTime()
        try {
          SparkEntry.queries(name)(spark, ampDir).collect()
          Some(name -> (System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          errors.getOrElseUpdate(name, e.toString.take(300)); None
        }
      }.toMap

    runPass(allNames); runPass(allNames)
    val names = allNames.filterNot(errors.contains)
    val passes = Seq.fill(5)(runPass(names))
    val medians = names
      .map { n => n -> passes.flatMap(_.get(n)) }
      .collect { case (n, ts) if ts.nonEmpty => n -> ts.sorted.apply(ts.size / 2) }
    val total = medians.map(_._2).sum
    val errJson = errors
      .map { case (k, v) => "\"" + k + "\":\"" + v.replaceAll("[\"\\\\\\n\\r\\t]", " ") + "\"" }
      .mkString("{", ",", "}")
    val json =
      s"""{"metric":"amp10_total","value":$total,"unit":"sec","queries":${
        medians.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
      },"errors":$errJson,"amp_dir":"$ampDir","protocol":"cluster posture, shuf=64, 2 warm + 5 timed passes, medians"}"""
    Files.writeString(Paths.get(outJson), json)
    println(json)
    spark.stop()
  }
}
