package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // skewed fixture: one hot key owning most rows
  private lazy val skewed = {
    val hot = (1 to 900).map(i => ("hot", i.toDouble))
    val cold = (1 to 100).map(i => (s"k${i % 10}", i.toDouble))
    (hot ++ cold).toDF("k", "v")
  }

  test("saltedAgg equals direct groupBy for sum/count/min/max/avg") {
    val direct = skewed.groupBy("k").agg(
      sum("v").as("sum_v"), count("v").as("count_v"),
      min("v").as("min_v"), max("v").as("max_v"), avg("v").as("avg_v"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val salted = Skew.saltedAgg(skewed, Seq("k"),
      Seq("v" -> Skew.Sum, "v" -> Skew.Count, "v" -> Skew.Min,
        "v" -> Skew.Max, "v" -> Skew.Avg), buckets = 8)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(salted.keySet == direct.keySet)
    direct.foreach { case (k, (s, c, mn, mx, av)) =>
      val (s2, c2, mn2, mx2, av2) = salted(k)
      assert(math.abs(s - s2) < 1e-9 && c == c2 && mn == mn2 && mx == mx2 &&
        math.abs(av - av2) < 1e-12, s"key $k differs")
    }
  }

  test("saltedJoin equals plain join (inner and left)") {
    val dim = Seq(("hot", "H"), ("k1", "K1"), ("k2", "K2"), ("absent", "A"))
      .toDF("k", "label")
    for (jt <- Seq("inner", "left")) {
      val plain = skewed.join(dim, Seq("k"), jt)
        .groupBy("k").agg(count(lit(1)).as("n"), first("label").as("l"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
      val salted = Skew.saltedJoin(skewed, dim, Seq("k"), buckets = 8, joinType = jt)
        .groupBy("k").agg(count(lit(1)).as("n"), first("label").as("l"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
      assert(salted == plain, s"joinType=$jt mismatch")
    }
  }

  test("property: saltedAgg equals direct groupBy on arbitrary skewed data") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // generator biases toward few hot keys over a long tail
    val rowGen = for {
      k <- Gen.frequency(5 -> Gen.const("hot"), 2 -> Gen.oneOf("a", "b"),
        1 -> Gen.choose(0, 50).map(i => s"t$i"))
      v <- Gen.choose(-1000, 1000).map(_.toDouble / 8)
    } yield (k, v)
    def sample(i: Int): List[(String, Double)] =
      Gen.listOfN(300, rowGen).apply(Gen.Parameters.default, Seed(7L * i)).get
    (1 to 5).foreach { i =>
      val df = sample(i).toDF("k", "v")
      val direct = df.groupBy("k")
        .agg(sum("v").as("s"), count("v").as("c"), min("v").as("mn"), max("v").as("mx"))
        .collect().map(r => r.getString(0) ->
          (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
      val salted = Skew.saltedAgg(df, Seq("k"),
        Seq("v" -> Skew.Sum, "v" -> Skew.Count, "v" -> Skew.Min, "v" -> Skew.Max),
        buckets = 7)
        .collect().map(r => r.getString(0) ->
          (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
      assert(salted.keySet == direct.keySet, s"sample $i key sets differ")
      direct.foreach { case (k, (s, c, mn, mx)) =>
        val (s2, c2, mn2, mx2) = salted(k)
        assert(math.abs(s - s2) < 1e-9 && c == c2 && mn == mn2 && mx == mx2,
          s"sample $i key $k differs")
      }
    }
  }

  test("saltedJoin rejects right/full outer join types") {
    val dim = Seq(("hot", "H")).toDF("k", "label")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(skewed, dim, Seq("k"), joinType = "full_outer")
    }
  }

  test("byte-identical duplicate rows fan out across salt buckets (ADVICE r2)") {
    // a hot key made of identical rows — raw pre-dedup ingest — must not
    // collapse into one salt bucket (a row-content-only hash would)
    val dupes = Seq.fill(512)(("hot", 1.0)).toDF("k", "v")
    val saltCount = dupes.select(Skew.rowSalt(dupes, 16).as("salt"))
      .agg(countDistinct("salt")).head().getLong(0)
    assert(saltCount >= 12, s"identical rows used only $saltCount of 16 salts")
    // and correctness is unchanged: salted agg still equals direct
    val direct = dupes.groupBy("k").agg(sum("v"), count("v")).head()
    val salted = Skew.saltedAgg(dupes, Seq("k"),
      Seq("v" -> Skew.Sum, "v" -> Skew.Count), buckets = 16).head()
    assert(salted.getDouble(1) == direct.getDouble(1) &&
      salted.getLong(2) == direct.getLong(2))
  }
}
