package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "tag")

  test("stages compose in order with >>") {
    val p = Stage("double")(df => df.withColumn("id2", col("id") * 2)) >>
      Stage("filter")(df => df.filter(col("id2") > 2))
    val out = p(base)
    assert(out.columns.toSeq == Seq("id", "tag", "id2"))
    assert(out.count() == 2)
  }

  test("pipeline of pipelines flattens") {
    val p1 = Stage("a")(df => df.withColumn("x", lit(1)))
    val p2 = Stage("b")(df => df.withColumn("y", lit(2))) >> Stage("c")(df => df.drop("x"))
    val p = p1 >> p2
    assert(p.stages.map(_.name) == Vector("a", "b", "c"))
    assert(p(base).columns.toSeq == Seq("id", "tag", "y"))
  }

  test("validate reports the failing stage without executing") {
    val p = Stage("ok")(df => df.withColumn("x", lit(1))) >>
      Stage("broken")(df => df.select(col("no_such_column")))
    p.validate(base) match {
      case Left(e) => assert(e.stage == "broken")
      case Right(_) => fail("expected validation failure")
    }
  }

  test("valid pipeline returns output schema without executing") {
    val p = Pipeline(Stage("proj")(df => df.select(col("id"), col("tag"))))
    val Right(schema) = p.validate(base): @unchecked
    assert(schema.fieldNames.toSeq == Seq("id", "tag"))
  }

  test("listeners fire start/complete in stage order, error on failure") {
    val events = scala.collection.mutable.ArrayBuffer[String]()
    val l = new PipelineListener {
      override def onStageStart(s: String): Unit = events += s"start:$s"
      override def onStageComplete(s: String, out: org.apache.spark.sql.DataFrame): Unit =
        events += s"done:$s"
      override def onStageError(s: String, e: Throwable): Unit = events += s"err:$s"
    }
    val p = (Stage("s1")(df => df) >> Stage("s2")(df => df)).withListener(l)
    p(base)
    assert(events.toSeq == Seq("start:s1", "done:s1", "start:s2", "done:s2"))

    events.clear()
    val bad = Pipeline(Vector(Stage("boom")(df => df.select(col("nope")))), Vector(l))
    intercept[StageValidationException](bad(base))
    assert(events.toSeq == Seq("start:boom", "err:boom"))
  }

  test("fanOut branches share one input; fanInUnion merges") {
    val branches = Map(
      "evens" -> Pipeline(Stage("e")(df => df.filter(col("id") % 2 === 0))),
      "odds" -> Pipeline(Stage("o")(df => df.filter(col("id") % 2 === 1))))
    val outs = Pipeline.fanOut(base, branches)
    val merged = Pipeline.fanInUnion(outs.values.toSeq)
    assert(merged.count() == 3)
  }

  test("fanInJoin joins branches on keys") {
    val counts = base.groupBy("tag").agg(count(lit(1)).as("n"))
    val sums = base.groupBy("tag").agg(sum("id").as("s"))
    val joined = Pipeline.fanInJoin(Seq("tag"))(Seq(counts, sums))
    assert(joined.columns.toSeq == Seq("tag", "n", "s"))
    assert(joined.count() == 2)
  }
}
