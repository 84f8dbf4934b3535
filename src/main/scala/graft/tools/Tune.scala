package graft.tools

import graft.Tables
import graft.ops.Relational
import org.apache.spark.sql.SparkSession

/** Dev probe: isolates the per-query latency floor (planning, task
  * dispatch, codegen cache hits) from real execution cost, across
  * shuffle-partition counts. Not part of the driver contract.
  */
object Tune {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val shufParts = sys.env.getOrElse("TUNE_SHUF", "32")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val aqe = sys.env.getOrElse("TUNE_AQE", "false")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufParts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", aqe)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).persist().count())

    def time(tag: String)(f: => Unit): Unit = {
      val times = (1 to 6).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      println(f"$tag%-22s ${times.map(t => f"$t%7.1f").mkString(" ")} ms")
    }

    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = for {s <- si.submissionTime; e <- si.completionTime} yield e - s
        println(f"    stage ${si.stageId}%3d tasks=${si.numTasks}%3d " +
          f"wall=${dur.getOrElse(-1L)}%6d ms run=${si.taskMetrics.executorRunTime}%6d ms " +
          f"gc=${si.taskMetrics.jvmGCTime}%5d ms deser=${si.taskMetrics.executorDeserializeTime}%5d ms " +
          f"ser=${si.taskMetrics.resultSerializationTime}%4d ms")
      }
    })

    println(s"== shuffle.partitions=$shufParts aqe=$aqe cpus=$cpus sf=$sfDir")
    // noop floor: count on cached table (1 stage, no shuffle)
    time("count_cached")(Tables.load(spark, sfDir, "lineitem").count())
    // pure planning: build plan + explain, no execution
    time("plan_only")(Relational.q01(spark, sfDir).queryExecution.executedPlan)
    time("q03_joins")(Relational.q03(spark, sfDir).collect())

    // HOF vs native cosine on the all-pairs workload
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions
    graft.GraftFunctions.register(spark)
    val e = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val prs = e.select(col("v").as("va"))
      .crossJoin(broadcast(e.select(col("v").as("vb"))))
    time("cosine_hof")(
      prs.agg(max(VectorFunctions.cosine(col("va"), col("vb")))).collect())
    time("cosine_native")(
      prs.agg(max(graft.GraftFunctions.cosineSim(col("va"), col("vb")))).collect())
    spark.stop()
  }
}
