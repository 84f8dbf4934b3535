package graft.functions

import graft.{GraftFunctions, SparkSpec}
import graft.functions.expressions.JaroWinkler
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Pins for the native Jaro-Winkler expression. The reference values
  * were read off DuckDB's `jaro_winkler_similarity` (the q125 oracle
  * engine) before the expression was written, so these tests pin the
  * EXACT cross-engine conventions: empty-string zeros, the
  * max(len/2−1, 0) match window, half-transposition counting, and the
  * strict >0.7 Winkler boost threshold with prefix ℓ ≤ 4.
  */
class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinkler.sim(UTF8String.fromString(a), UTF8String.fromString(b))

  test("classic textbook pairs match DuckDB bit-for-bit") {
    assert(jw("martha", "marhta") == 0.9611111111111111)
    assert(jw("dixon", "dicksonx") == 0.8133333333333332)
    assert(jw("jellyfish", "smellyfish") == 0.8962962962962964)
    assert(jw("dwayne", "duane") == 0.8400000000000001)
    assert(jw("aaab", "aaac") == 0.8833333333333334)
    assert(jw("abc", "abc") == 1.0)
  }

  test("empty strings are 0, including both-empty (the DuckDB convention)") {
    assert(jw("", "") == 0.0)
    assert(jw("a", "") == 0.0)
    assert(jw("", "a") == 0.0)
  }

  test("window max(len/2-1, 0): adjacent transposition of 2-char strings is 0") {
    assert(jw("ab", "ba") == 0.0) // window 0 → no matches at all
    assert(jw("x", "y") == 0.0)
  }

  test("boost threshold is STRICT >0.7 and prefix caps at 4") {
    // crate/trace: jaro exactly 0.7333… > 0.7 but common prefix 0 → no boost
    assert(jw("crate", "trace") == 0.7333333333333334)
    // ab/abcdefghij: jaro 0.7333…, prefix 2 → 0.7333 + 2·0.1·(1−0.7333)
    assert(jw("ab", "abcdefghij") == 0.7866666666666667)
    // identical 4+ prefix uses ℓ = 4, not more
    assert(jw("prefix_same_long", "prefix_same_lxng") == 0.975)
  }

  test("expression evaluates under codegen and via SQL registration") {
    initQuiet()
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(("martha", "marhta"), ("dixon", "dicksonx"), ("", ""))
      .toDF("a", "b")
    val viaColumn = df.select(GraftFunctions.jaroWinkler(col("a"), col("b")))
      .collect().map(_.getDouble(0)).toSeq
    assert(viaColumn == Seq(0.9611111111111111, 0.8133333333333332, 0.0))
    df.createOrReplaceTempView("jwt")
    val viaSql = spark.sql("SELECT jaro_winkler(a, b) FROM jwt")
      .collect().map(_.getDouble(0)).toSeq
    assert(viaSql == viaColumn)
    // nulls propagate (BinaryExpression null intolerance)
    val withNull = Seq((Some("a"), None: Option[String])).toDF("a", "b")
      .select(GraftFunctions.jaroWinkler(col("a"), col("b"))).collect().head
    assert(withNull.isNullAt(0))
  }

  test("symmetry and range on random inputs") {
    val rnd = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      val a = rnd.alphanumeric.take(rnd.nextInt(10)).mkString
      val b = rnd.alphanumeric.take(rnd.nextInt(10)).mkString
      val s = jw(a, b)
      assert(s == jw(b, a))
      assert(s >= 0.0 && s <= 1.0)
      if (a == b && a.nonEmpty) assert(s == 1.0)
    }
  }
}
