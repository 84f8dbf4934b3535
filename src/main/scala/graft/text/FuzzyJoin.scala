package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance self-join via symmetric-delete blocking (the SymSpell
  * scheme, public domain): two strings within edit distance k always
  * share at least one string reachable from each by ≤k single-character
  * deletions — for any ≤k-operation edit script, deleting from each
  * side the characters the script touches leaves the same common
  * subsequence, and each side loses at most k characters. So the
  * deletion neighborhoods form a LOSSLESS candidate filter: emit every
  * ≤k-deletion variant as an inverted-index key, equi-join on the
  * variant, verify candidates with exact levenshtein.
  *
  * Scale shape: |variants(s)| ≤ 1 + |s| + |s|²/2 for k=2 — the index is
  * a bounded blow-up of the input, candidates arrive via ONE equi-join
  * shuffle on the variant key (never all-pairs), and the levenshtein
  * verify is a narrow post-join filter. Very short strings (|s| ≤ k)
  * share the empty-string variant with each other — that bucket's size
  * is the count of short strings, which for natural-language vocabulary
  * is a bounded set; for adversarial corpora pre-partition by length
  * band (|len(a)−len(b)| ≤ k is implied by the distance bound).
  */
object FuzzyJoin {

  /** All strings obtainable from `t` by deleting exactly one character
    * (empty input → no variants). Pure codegen'd HOFs — no UDF.
    */
  private def del1(t: Column): Column =
    when(length(t) <= 0, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), length(t) - 1),
        i => concat(t.substr(lit(1), i), t.substr(i + lit(2), length(t)))))

  /** The ≤`k`-deletion neighborhood of `s`, including `s` itself. */
  def deleteVariants(s: Column, k: Int): Column = {
    require(k >= 0 && k <= 2, s"maxDist must be 0..2 (neighborhood is O(|s|^k)); got $k")
    val v0 = array(s)
    if (k == 0) v0
    else {
      val v1 = del1(s)
      if (k == 1) array_distinct(concat(v0, v1))
      else array_distinct(concat(v0, v1, flatten(transform(v1, t => del1(t)))))
    }
  }

  /** All unordered pairs of DISTINCT values of `strCol` within edit
    * distance `maxDist`: output (s1, s2, dist) with s1 < s2. Lossless —
    * equal, by construction, to the all-pairs levenshtein filter.
    */
  def symDeleteJoin(df: DataFrame, strCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2, s"maxDist must be 1 or 2; got $maxDist")
    val idx = df.select(col(strCol).as("__s")).distinct()
      .select(col("__s"), explode(deleteVariants(col("__s"), maxDist)).as("__v"))
    idx.as("a").join(idx.as("b"),
        col("a.__v") === col("b.__v") && col("a.__s") < col("b.__s"))
      .select(col("a.__s").as("s1"), col("b.__s").as("s2"))
      .distinct()
      .withColumn("dist", levenshtein(col("s1"), col("s2")))
      .filter(col("dist") <= maxDist)
  }
}
