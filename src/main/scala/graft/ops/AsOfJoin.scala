package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: match each left row to the latest right row with
  * `right.time <= left.time` within the same partition keys.
  *
  * Spark has no ASOF join primitive, so this is a derived operator
  * (SURVEY.md §2.2 Q18). Implementation is the union + last-value-window
  * form rather than join-then-reduce: both sides are tagged, unioned, and
  * a single `last(_, ignoreNulls)` window over (keys, time) carries the
  * most recent right-side row forward to each left row.
  *
  * Scale rationale: this costs ONE shuffle (by `keys`) and a per-key sort
  * — O(n log n) per key — whereas the naive equi-join + filter + groupBy
  * materializes every (left, earlier-right) pair, which is quadratic in
  * per-key density and shuffles twice. At 100 TB with hot keys the union
  * form degrades to a big sort, not a pair explosion.
  *
  * Tie rule: a right row at exactly `left.time` matches (`<=`), ensured by
  * sorting right-side rows before left-side rows at equal times — the same
  * inclusive-boundary rule as DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`.
  * Null rule: a null-ts right row never matches anyone; a null-ts left row
  * is kept with a null match (left-join contract). Both are pinned by
  * AsOfJoinPropertySpec against a reference scan on tie-heavy fixtures.
  */
object AsOfJoin {

  /** @param left       probe side (rows to enrich)
    * @param right      reference side (rows to look up)
    * @param keys       equi partition keys present on both sides
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param rightCols  (rightColumn, outputName) pairs carried from the
    *                   matched right row (null when no match)
    * @param direction  "backward" (latest right with rt <= lt, default)
    *                   or "forward" (earliest right with rt >= lt)
    * @param toleranceSeconds  max |lt − rt| for a match to count; wider
    *                   matches become null (match nulled, left row kept)
    * @return all `left` columns + the carried right columns
    */
  def apply(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightCols: Seq[(String, String)],
      direction: String = "backward",
      toleranceSeconds: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward", s"bad direction: $direction")

    val leftPayload = left.columns.toSeq.filterNot(keys.contains)
    // always carry the matched right timestamp — tolerance needs it
    val carried = rightCols :+ (rightTime -> "__match_ts")

    // A null-ts right row can never be "at or before" anything, but under
    // ascending null-first ordering it would sort ahead of every real row
    // and its payload would be carried as a bogus match — drop them here.
    // Null-ts LEFT rows are kept (left-join contract) and get a null
    // match via the __ts guard in withinTol below.
    val rightNonNull = right.filter(col(rightTime).isNotNull)

    // Tag and align both sides to one schema:
    //   keys ++ __ts ++ __side ++ __r_<out>* ++ __l_<leftCol>*
    // side 0 = right, 1 = left: right rows sort before left rows at equal
    // ts in BOTH directions, so a ts-equal right row is visible (<= / >=).
    val taggedRight = rightNonNull.select(
      keys.map(col) ++
        Seq(col(rightTime).as("__ts"), lit(0).as("__side")) ++
        carried.map { case (src, out) => col(src).as(s"__r_$out") } ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")): _*)

    val taggedLeft = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__ts"), lit(1).as("__side")) ++
        carried.map { case (src, out) =>
          lit(null).cast(right.schema(src).dataType).as(s"__r_$out") } ++
        leftPayload.map(c => col(c).as(s"__l_$c")): _*)

    val timeOrder = if (direction == "backward") col("__ts").asc else col("__ts").desc
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(timeOrder, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = taggedRight.unionByName(taggedLeft)
      .select(
        keys.map(col) ++
          Seq(col("__ts"), col("__side")) ++
          carried.map { case (_, out) =>
            last(col(s"__r_$out"), ignoreNulls = true).over(w).as(out) } ++
          leftPayload.map(c => col(s"__l_$c")): _*)
      .filter(col("__side") === 1)

    val withinTol = toleranceSeconds match {
      case Some(tol) => col("__ts").isNotNull &&
        abs(col("__ts").cast("long") - col("__match_ts").cast("long")) <= tol
      case None => col("__ts").isNotNull && col("__match_ts").isNotNull
    }
    matched
      .select(
        keys.map(col) ++
          Seq(col("__ts").as(leftTime)) ++
          leftPayload.filterNot(_ == leftTime).map(c => col(s"__l_$c").as(c)) ++
          rightCols.map { case (_, out) =>
            when(withinTol, col(out)).otherwise(lit(null)).as(out) }: _*)
  }
}
