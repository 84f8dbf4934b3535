package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RoutingSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq((1L, 5.0), (2L, -3.0), (3L, 8.0)).toDF("id", "v")

  test("route sends rows through the matching branch only (C6)") {
    val out = Pipeline.route(
      col("v") > 0,
      Pipeline(Stage("pos")(df => df.withColumn("sign", lit("pos")))),
      Pipeline(Stage("neg")(df => df.withColumn("sign", lit("neg")))))(base)
    val m = out.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(m == Map(1L -> "pos", 2L -> "neg", 3L -> "pos"))
  }

  test("deadLetter splits invalid rows for quarantine (C7)") {
    val (ok, dead) = Pipeline.deadLetter(base, col("v") >= 0)
    assert(ok.count() == 2 && dead.count() == 1)
    assert(dead.collect().head.getLong(0) == 2L)
  }

  test("context-aware stages receive the run context (C8)") {
    implicit val ctx: PipelineContext =
      PipelineContext(spark, "run-42", Map("tag" -> "test"))
    val s = PipelineContext.stage("tagger") { c => df =>
      df.withColumn("run_id", lit(c.runId)).withColumn("tag", lit(c.conf("tag")))
    }
    val out = Pipeline(s)(base)
    val r = out.collect().head
    assert(r.getString(2) == "run-42" && r.getString(3) == "test")
  }
}
