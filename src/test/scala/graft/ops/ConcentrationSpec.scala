package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computable pins for the concentration/coverage family
  * (q121–q124). */
class ConcentrationSpec extends SparkSpec {

  import spark.implicits._

  test("gini: perfect equality is 0; one-takes-all approaches (n-1)/n") {
    initQuiet()
    val eq = (1 to 4).map(i => ("e", i.toLong, 100L)).toDF("k", "id", "v")
    val g1 = Concentration.gini(eq, "k", "v", "id").collect().head
    assert(g1.getLong(1) == 4L)
    assert(g1.getDouble(2) == 0.0)
    // [0,0,0,100]: ranks 1..4, Σx=100, Σrx=400 → (800-500)/400 = 0.75
    val uneq = Seq(("u", 1L, 0L), ("u", 2L, 0L), ("u", 3L, 0L), ("u", 4L, 100L))
      .toDF("k", "id", "v")
    assert(Concentration.gini(uneq, "k", "v", "id")
      .collect().head.getDouble(2) == 0.75)
  }

  test("pareto: exact integer crossing at 4/5") {
    initQuiet()
    // values 50,30,10,10 (total 100): cum 50,80,90,100 — 80·5 ≥ 100·4
    // exactly at k=2; share_at_k = 0.8. (Group col deliberately NOT
    // named "k": the output carries a "k" column of its own.)
    val df = Seq(("p", 1L, 50L), ("p", 2L, 30L), ("p", 3L, 10L), ("p", 4L, 10L))
      .toDF("g", "id", "v")
    val r = Concentration.paretoThreshold(df, "g", "v", "id", 4, 5)
      .collect().head
    assert(r.getLong(1) == 4L)   // n
    assert(r.getInt(2) == 2)     // k
    assert(r.getDouble(3) == 0.5) // frac
    assert(r.getDouble(4) == 0.8) // share
  }

  test("cr-k: ties on value break on the tie column deterministically") {
    initQuiet()
    // values 40,40,10,10 with k=2: top-2 = 80/100 whichever tie order,
    // but the ROWS cut must still be deterministic — pin cr2 = 0.8
    val df = Seq(("c", 1L, 40L), ("c", 2L, 40L), ("c", 3L, 10L), ("c", 4L, 10L))
      .toDF("k", "id", "v")
    val r = Concentration.concentrationRatio(df, "k", "v", "id", 2)
      .collect().head
    assert(r.getLong(1) == 4L)
    assert(r.getDouble(2) == 0.8)
  }

  test("oov: tokens outside the top-N vocabulary are counted per group") {
    initQuiet()
    // corpus tokens: 'a'×4, 'b'×3, 'c'×1 → vocab(2) = {a, b}; group g2
    // holds the only 'c' → oov 1/3
    val df = Seq(("g1", "a a b"), ("g1", "a b"), ("g2", "a b c"))
      .toDF("src", "text")
    val out = Concentration.oovRates(df, "src", "text", vocabSize = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("g1") == ((5L, 0L, 0.0)))
    assert(out("g2") == ((3L, 1L, 0.333333)))
  }

  test("oov: vocabulary tiebreak is (count desc, token asc)") {
    initQuiet()
    // 'x' and 'y' both appear twice; vocab(1) must pick 'x' (asc tie)
    val df = Seq(("g", "x y"), ("g", "y x")).toDF("src", "text")
    val out = Concentration.oovRates(df, "src", "text", vocabSize = 1)
      .collect().head
    assert(out.getLong(1) == 4L)
    assert(out.getLong(2) == 2L) // both 'y' occurrences are OOV
  }

  test("quality curve: monotone non-increasing retention, t=0 keeps all") {
    initQuiet()
    val out = Concentration.qualityCurveQuery(spark, sf)
      .collect().map(r => r.getDouble(0) -> (r.getLong(1), r.getDouble(3)))
    assert(out.nonEmpty)
    assert(out.head._1 == 0.0 && out.head._2._2 == 1.0) // t=0 keeps everything
    // retention can only fall as the bar rises
    out.map(_._2._1).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a >= b); case _ => ()
    }
  }

  test("readability: integer word/vowel-group counts, closed-form Flesch") {
    initQuiet()
    // "data data": 2 words, 4 vowel groups (d-a-t-a twice) →
    // flesch = 206.835 − 1.015·2 − 84.6·2 = 35.605
    val df = Seq(("s", "data data")).toDF("g", "t")
    val r = Concentration.readability(df, "g", "t").collect().head
    assert(r.getLong(1) == 1 && r.getLong(2) == 2 && r.getLong(3) == 4)
    assert(r.getDouble(6) == 35.605)
  }

  test("lexical diversity: ttr and within-group hapax share") {
    initQuiet()
    // tokens a,b,a: total 3, distinct 2, hapax {b} → ttr 2/3, share 1/2
    val df = Seq(("s", "a b a")).toDF("g", "t")
    val r = Concentration.lexicalDiversity(df, "g", "t").collect().head
    assert(r.getLong(1) == 3 && r.getLong(2) == 2 && r.getLong(3) == 1)
    assert(r.getDouble(4) == 0.666667 && r.getDouble(5) == 0.5)
  }

  test("q121-q124 run end-to-end on the corpus") {
    initQuiet()
    assert(Concentration.giniQuery(spark, sf).count() == 5)
    assert(Concentration.paretoQuery(spark, sf).count() == 5)
    assert(Concentration.cr4Query(spark, sf).count() > 0)
    val oov = Concentration.oovQuery(spark, sf).collect()
    assert(oov.nonEmpty && oov.forall(r => r.getDouble(3) >= 0 && r.getDouble(3) <= 1))
  }
}
