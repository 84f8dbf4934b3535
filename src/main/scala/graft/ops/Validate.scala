package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality gates: declarative row constraints with violation
  * routing, duplicate-key detection, and referential-integrity orphan
  * scans — the checks a production ingest runs BEFORE letting data into
  * the curated layer.
  *
  * Scale shape: rule evaluation is a narrow scan-side projection (zero
  * shuffles — every rule is a Catalyst expression, so a thousand rules
  * still cost one codegen'd pass); [[duplicateKeys]] is one
  * partial-aggregating groupBy; [[orphans]] aggregates the fact side to
  * its distinct keys FIRST, so the anti-join input is key-cardinality-
  * sized, not fact-sized.
  *
  * Null discipline: a rule whose predicate evaluates to NULL counts as
  * a VIOLATION (`<=> true`, same null-safety as
  * [[graft.core.Pipeline]]'s route/deadLetter) — unknown is not a pass.
  */
object Validate {

  /** A named row constraint; `predicate` must be true for a clean row. */
  final case class Rule(name: String, predicate: Column)

  def notNull(c: String): Rule = Rule(s"not_null_$c", col(c).isNotNull)
  def inRange(c: String, lo: Double, hi: Double): Rule =
    Rule(s"range_$c", col(c).between(lo, hi))
  def matches(c: String, regex: String): Rule =
    Rule(s"matches_$c", col(c).rlike(regex))

  /** Every input row + `violations: array<string>` — the names of the
    * rules it fails (empty array = clean). One narrow pass. */
  def annotate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules given")
    require(rules.map(_.name).distinct.size == rules.size, "duplicate rule names")
    val flags = array(rules.map(r =>
      when(!(r.predicate <=> true), lit(r.name))): _*)
    df.withColumn("violations", filter(flags, v => v.isNotNull))
  }

  /** (clean, violating) split; the violating side keeps its
    * `violations` column for dead-letter diagnostics. Clean ∪ violating
    * = input, always — rows are never silently dropped. */
  def split(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val tagged = annotate(df, rules)
    (tagged.filter(size(col("violations")) === 0).drop("violations"),
      tagged.filter(size(col("violations")) > 0))
  }

  /** Key groups violating a uniqueness constraint: one row per
    * duplicated key with its multiplicity. Empty result = constraint
    * holds. */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "no key columns given")
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1)
  }

  /** Referential-integrity orphans: DISTINCT non-null `fkCol` values in
    * `fact` with no matching `pkCol` in `dim`, each with its referencing
    * row count. Standard FK semantics: a null FK references nothing and
    * is never an orphan (guard it with [[notNull]] if nulls are
    * illegal). Aggregate-then-anti-join: the join side is distinct-key-
    * sized; broadcast it when the key space fits. */
  def orphans(fact: DataFrame, fkCol: String, dim: DataFrame, pkCol: String): DataFrame = {
    val factKeys = fact.filter(col(fkCol).isNotNull)
      .groupBy(col(fkCol)).agg(count(lit(1)).as("n_refs"))
    factKeys.join(dim.select(col(pkCol).as(fkCol)).distinct(), Seq(fkCol), "left_anti")
  }
}
