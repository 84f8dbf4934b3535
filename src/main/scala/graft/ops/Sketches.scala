package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-sketch operators: count-min frequency estimation with
  * heavy-hitter extraction, and rank-error-bounded quantiles. Both
  * follow the q31 verification reshape: the sketch's DETERMINISTIC
  * guarantees (count-min never under-estimates; its over-estimate is
  * ≤ e/width·N with the standard Markov argument; KLL/GK rank error is
  * ≤ N/accuracy) are emitted as boolean columns next to exactly
  * computed values, so an external engine that cannot run the sketch
  * can still hash-match the full output.
  */
object Sketches {

  /** Count-min sketch table over whitespace tokens of `textCol`:
    * `depth` hash rows × `width` buckets, cell (r, b) holding the total
    * count of token instances whose seeded xxhash64 lands in bucket b
    * of row r.
    *
    * This is the true streaming-CMS plan shape: ONE shuffle whose
    * map-side partial aggregation compresses every partition to at most
    * depth × width cells, regardless of vocabulary size — the reason to
    * use CMS instead of an exact `groupBy(token)` when the vocabulary
    * itself is shuffle-dominating. Output is depth × width rows (KB),
    * broadcastable for estimate joins.
    */
  def countMinSketch(df: DataFrame, textCol: String, depth: Int, width: Int,
      seed: Long = 0L): DataFrame = {
    require(depth >= 1 && width >= 1, s"depth/width must be >= 1: $depth x $width")
    val rows = (0 until depth).map { r =>
      struct(lit(r).as("r"),
        pmod(xxhash64(col("_tok"), lit(seed + r)), lit(width.toLong)).as("b"))
    }
    df.select(explode(split(col(textCol), " ")).as("_tok"))
      .select(explode(array(rows: _*)).as("_cell"))
      .groupBy(col("_cell.r").as("r"), col("_cell.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Heavy hitters with count-min verification: tokens whose exact count
    * exceeds `phiNum/phiDen` of total token mass, with the CMS estimate
    * (min over rows of the token's bucket count) checked against its two
    * deterministic guarantees:
    *
    *  - `est_ge`: estimate ≥ exact count — ALWAYS true (every bucket a
    *    token hashes to contains at least all of that token's mass);
    *  - `est_within`: estimate ≤ exact + ⌈e/width · N⌉ — the standard
    *    ε = e/width bound, which holds per-row with probability
    *    ≥ 1 − 1/e and over the min of `depth` independent rows with
    *    probability ≥ 1 − e^−depth; deterministic for a fixed corpus
    *    and seed (spec-asserted on this one).
    *
    * The threshold compare is pure integer arithmetic
    * (`cnt·phiDen > N·phiNum`) so an external oracle replays it without
    * float-boundary risk. Exact counts here are the VERIFICATION side:
    * the production artifact at 100 TB is [[countMinSketch]]'s
    * fixed-size table plus this join, with the exact `groupBy(token)`
    * replaced by whatever candidate stream you have (e.g. a sampled
    * vocabulary); the candidate-estimate join stays broadcast because
    * the sketch is KB-sized.
    *
    * Output: `token`, `cnt`, `est_ge`, `est_within`, ordered by
    * (`cnt` desc, `token`).
    */
  def heavyHitters(df: DataFrame, textCol: String, phiNum: Long, phiDen: Long,
      depth: Int = 4, width: Int = 1024, seed: Long = 0L): DataFrame = {
    require(phiNum > 0 && phiDen > 0, s"phi must be positive: $phiNum/$phiDen")
    val toks = df.select(explode(split(col(textCol), " ")).as("_tok"))
    val exact = toks.groupBy(col("_tok").as("token")).agg(count(lit(1)).as("cnt"))
    // total mass WITHOUT a second explode+shuffle over the corpus: a
    // narrow per-document token count collapses to one scalar in a
    // single scan (Catalyst does not share the exact-count subtree, so
    // deriving the total from `exact` would re-run its shuffle)
    val total = df.agg(
      sum(size(split(col(textCol), " ")).cast("long")).as("_total"))
    val cand = exact.crossJoin(broadcast(total))
      .filter(col("cnt") * lit(phiDen) > col("_total") * lit(phiNum))
    val sketch = countMinSketch(df, textCol, depth, width, seed)
      .withColumnRenamed("cnt", "cnt_sketch")
    val cells = (0 until depth).map { r =>
      struct(lit(r).as("r"),
        pmod(xxhash64(col("token"), lit(seed + r)), lit(width.toLong)).as("b"))
    }
    val est = cand
      .select(col("token"), col("cnt"), col("_total"),
        explode(array(cells: _*)).as("_cell"))
      .join(broadcast(sketch),
        col("_cell.r") === col("r") && col("_cell.b") === col("b"))
      .groupBy(col("token"))
      .agg(first(col("cnt")).as("cnt"), first(col("_total")).as("_total"),
        min(col("cnt_sketch")).as("est"))
    est.select(col("token"), col("cnt"),
        (col("est") >= col("cnt")).as("est_ge"),
        (col("est") <= col("cnt") +
          ceil(lit(math.E) * col("_total") / lit(width.toDouble)).cast("long"))
          .as("est_within"))
      .orderBy(col("cnt").desc, col("token"))
  }

  /** Rank-error-bounded quantile per group: the mergeable
    * `approx_percentile` sketch (Greenwald–Khanna variant, the operator
    * you would actually run at 100 TB — bounded memory per group,
    * merge-safe partials) verified against its contract: the sketch's
    * answer must sit within `n/accuracy` ranks of the target rank. The
    * exact interpolated percentile column is the VERIFICATION side — it
    * buffers each group's values and does not scale; the product is the
    * sketch + the proven bound.
    *
    * Output per group: `n`, the exact percentile rounded to 4 dp, and
    * `approx_ok` (deterministic for a fixed corpus). Two aggregates over
    * the input (sketch+exact, then rank counts around the sketch's
    * answer) joined broadcast — group cardinality rows, never data rows.
    */
  def quantileBound(df: DataFrame, valueCol: String, groupCol: String,
      p: Double, accuracy: Int = 100): DataFrame = {
    require(p > 0 && p < 1, s"p must be in (0,1): $p")
    require(accuracy >= 1, s"accuracy must be >= 1: $accuracy")
    val v = col(valueCol)
    val agg = df.groupBy(col(groupCol)).agg(
      count(v).as("n"),
      expr(s"percentile($valueCol, $p)").as("_exact"),
      percentile_approx(v, lit(p), lit(accuracy)).as("_approx"))
    val ranks = df
      .join(broadcast(agg.select(col(groupCol), col("_approx"))), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(count(when(v < col("_approx"), 1)).as("_lt"),
        count(when(v <= col("_approx"), 1)).as("_le"))
    val err = col("n").cast("double") / lit(accuracy.toDouble)
    val target = lit(p) * col("n").cast("double")
    agg.join(broadcast(ranks), Seq(groupCol))
      .select(col(groupCol), col("n"),
        round(col("_exact"), 4).as(s"p${(p * 100).round}"),
        (col("_lt").cast("double") <= target + err &&
          col("_le").cast("double") >= target - err).as("approx_ok"))
      .orderBy(col(groupCol))
  }
}
