package graft

import graft.ops.{Behavior, BehaviorOracle, Bloom, BloomOracle, Concentration, ConcentrationOracle, Curation, CurationOracle, Drift, DriftOracle, Graph, GraphOracle, Integrity, IntegrityOracle, Ledger, LedgerOracle, OracleSql, Recommend, RecommendOracle, Relational, Selection, SelectionOracle, Spans, SpansOracle, TimeSeries, TimeSeriesOracle}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY.md §2.2 Q01–Q20 plus
  * the LLM-pipeline operators); `oracleSql` holds the DuckDB-equivalent
  * SQL for every query that is SQL-expressible. Keys and column aliases
  * match pairwise — the driver's comparator matches columns by name.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q03(spark, "/root/testdata/sf0.001")

  /** One row per query family: (family name, query inventory, oracle
    * inventory). `queries`, `oracleSql`, AND InventorySpec's anti-shadowing
    * guard all derive from this single list — adding a family here wires it
    * into the driver gate and the registry-integrity spec in one place, so
    * the guard can never go stale against the registry again.
    */
  val families: Seq[(String, Seq[(String, (SparkSession, String) => DataFrame)], Seq[(String, String)])] = Seq(
    ("relational", Relational.all, OracleSql.all),
    ("curation", Curation.all, CurationOracle.all),
    ("integrity", Integrity.all, IntegrityOracle.all),
    ("behavior", Behavior.all, BehaviorOracle.all),
    ("timeseries", TimeSeries.all, TimeSeriesOracle.all),
    ("graph", Graph.all, GraphOracle.all),
    ("drift", Drift.all, DriftOracle.all),
    ("spans", Spans.all, SpansOracle.all),
    ("concentration", Concentration.all, ConcentrationOracle.all),
    ("recommend", Recommend.all, RecommendOracle.all),
    ("ledger", Ledger.all, LedgerOracle.all),
    ("bloom", Bloom.all, BloomOracle.all),
    ("selection", Selection.all, SelectionOracle.all)
  )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    families.flatMap(_._2).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    families.flatMap(_._3).toMap
}
