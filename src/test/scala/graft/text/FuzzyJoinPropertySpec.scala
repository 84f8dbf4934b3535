package graft.text

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property pins for the symmetric-delete fuzzy join: the delete-
  * neighborhood blocking + levenshtein verify must produce EXACTLY the
  * pairs of the brute-force all-pairs filter, for every fixture and
  * both k=1 and k=2. Generators stress the blocking's failure surfaces:
  *   - a tiny alphabet (near-duplicates are the common case)
  *   - the empty string and length-≤k strings (their neighborhoods
  *     collapse to the empty-string bucket)
  *   - pairs at exactly distance k and k+1 (inclusion boundary)
  */
class FuzzyJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Reference: classic O(nm) DP levenshtein. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = d(0); d(0) = j
      for (i <- 1 to a.length) {
        val t = d(i)
        d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = t
      }
    }
    d(a.length)
  }

  private val word: Gen[String] = for {
    n <- Gen.choose(0, 6)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
  } yield cs.mkString

  private val vocabGen: Gen[Seq[String]] =
    Gen.listOfN(40, word).map(ws => (ws :+ "").distinct)

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(4242L + i)))

  test("symDeleteJoin equals brute-force all-pairs for k=1 and k=2") {
    samples(vocabGen, 12).zipWithIndex.foreach { case (vocab, i) =>
      val df = vocab.toDF("w")
      for (k <- Seq(1, 2)) {
        val got = FuzzyJoin.symDeleteJoin(df, "w", k)
          .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
        val want = (for {
          a <- vocab; b <- vocab if a < b
          d = lev(a, b) if d <= k
        } yield (a, b, d)).toSet
        assert(got == want,
          s"fixture $i k=$k: missing=${want -- got} extra=${got -- want}")
      }
    }
  }

  test("deleteVariants neighborhood size stays within the documented bound") {
    val df = Seq("abcdef").toDF("w")
    import org.apache.spark.sql.functions.{col, size}
    val n = df.select(size(FuzzyJoin.deleteVariants(col("w"), 2))).head().getInt(0)
    // 1 + 6 + C(6,2) = 22 distinct variants for a 6-char string of
    // distinct chars ("abcdef" deletions never collide)
    assert(n == 22)
  }
}
