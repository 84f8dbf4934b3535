package graft.core

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based DSL checks (SURVEY §5.2): arbitrary DAGs of
  * schema-compatible stages must validate ⇔ compose, and composition
  * must equal sequential application. Uses ScalaCheck generators with a
  * fixed seed (deterministic, no scalatestplus bridge needed offline).
  */
class PipelinePropertySpec extends SparkSpec {
  import spark.implicits._

  private def base: DataFrame = Seq((1L, 2.0), (2L, 4.0), (3L, 8.0)).toDF("id", "v")

  // a closed family of schema-compatible stages
  private val compatibleStage: Gen[Stage] = Gen.oneOf(
    Gen.choose(1, 5).map(n => Stage(s"mul$n")(df => df.withColumn("v", col("v") * n))),
    Gen.choose(0, 3).map(n => Stage(s"filter$n")(df => df.filter(col("id") > n))),
    Gen.const(Stage("dup")(df => df.withColumn("v2", col("v")))),
    Gen.const(Stage("rename")(df => df.withColumnRenamed("v2", "v3"))))

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("compatible chains always validate and run (validate <=> compose)") {
    samples(Gen.listOfN(4, compatibleStage), 20).foreach { stages =>
      val p = Pipeline(stages.toVector)
      val v = p.validate(base)
      assert(v.isRight, s"${stages.map(_.name)} failed: $v")
      val composed = p(base).collect().toSet
      val sequential = stages.foldLeft(base)((df, s) => s(df)).collect().toSet
      assert(composed == sequential, s"compose != sequential for ${stages.map(_.name)}")
    }
  }

  test("any chain containing a schema-breaking stage fails validation at it") {
    samples(Gen.zip(Gen.listOfN(2, compatibleStage), Gen.listOfN(2, compatibleStage)), 20)
      .foreach { case (pre, post) =>
        val broken = Stage("broken")(df => df.select(col("missing_col")))
        val p = Pipeline(pre.toVector ++ Vector(broken) ++ post.toVector)
        p.validate(base) match {
          case Left(e) => assert(e.stage == "broken")
          case Right(_) => fail(s"expected failure: ${(pre ++ post).map(_.name)}")
        }
      }
  }
}
