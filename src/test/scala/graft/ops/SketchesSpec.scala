package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("countMinSketch: cell mass equals token mass; shape is depth x <=width") {
    val docs = Tables.load(spark, sf, "documents")
    val sk = Sketches.countMinSketch(docs, "text", depth = 4, width = 64, seed = 1L)
    val cells = sk.collect()
    assert(cells.map(_.getInt(0)).distinct.sorted.sameElements(Array(0, 1, 2, 3)))
    assert(cells.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 64))
    val mass = sk.groupBy("r").agg(sum("cnt")).collect().map(_.getLong(1)).distinct
    val total = docs.select(explode(split(col("text"), " "))).count()
    assert(mass.sameElements(Array(total))) // every row partitions the full mass
  }

  test("CMS never under-estimates: est >= exact for EVERY token") {
    val docs = Tables.load(spark, sf, "documents")
    // width 8 forces heavy collisions — the over-estimate property must
    // still hold for every token, not just the uncollided ones
    val sk = Sketches.countMinSketch(docs, "text", depth = 3, width = 8, seed = 7L)
      .withColumnRenamed("cnt", "cnt_sketch")
    val exact = docs.select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val cells = (0 until 3).map { r =>
      struct(lit(r).as("r"), pmod(xxhash64(col("token"), lit(7L + r)), lit(8L)).as("b"))
    }
    val est = exact.select(col("token"), col("cnt"), explode(array(cells: _*)).as("c"))
      .join(sk, col("c.r") === col("r") && col("c.b") === col("b"))
      .groupBy("token").agg(first("cnt").as("cnt"), min("cnt_sketch").as("est"))
    assert(est.filter(col("est") < col("cnt")).count() == 0)
    // and with collisions this tight, SOME token must be over-estimated
    assert(est.filter(col("est") > col("cnt")).count() > 0)
  }

  test("heavyHitters: both guarantees deterministically true at query params") {
    val docs = Tables.load(spark, sf, "documents")
    val hh = Sketches.heavyHitters(docs, "text", 335, 10000, 4, 1024, 42L).collect()
    assert(hh.nonEmpty)
    assert(hh.forall(_.getBoolean(2)), "est_ge must always hold")
    assert(hh.forall(_.getBoolean(3)), "est_within must hold for this corpus+seed")
    // ordered by cnt desc, token
    val cnts = hh.map(_.getLong(1))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
  }

  test("quantileBound: bound holds, exact median matches a hand window calc") {
    val df = Seq.tabulate(101)(i => ("g", i.toDouble)).toDF("grp", "v")
    val out = Sketches.quantileBound(df, "v", "grp", 0.5, accuracy = 100).collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == 101L)
    assert(out.head.getDouble(2) == 50.0) // exact interpolated median of 0..100
    assert(out.head.getBoolean(3))
  }

  test("quantileBound: holds on events at the q78 params; nulls ignored") {
    val ev = Tables.load(spark, sf, "events")
    val out = Sketches.quantileBound(ev, "value", "event_type", 0.5, 100).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getBoolean(3)))
    val nonNull = ev.filter(col("value").isNotNull).count()
    assert(out.map(_.getLong(1)).sum == nonNull)
  }

  test("guards") {
    val df = Seq(("g", 1.0)).toDF("grp", "v")
    intercept[IllegalArgumentException](Sketches.quantileBound(df, "v", "grp", 0.0))
    intercept[IllegalArgumentException](Sketches.quantileBound(df, "v", "grp", 0.5, 0))
    intercept[IllegalArgumentException](Sketches.countMinSketch(df, "grp", 0, 8))
    intercept[IllegalArgumentException](Sketches.heavyHitters(df, "grp", 0, 1))
  }
}
