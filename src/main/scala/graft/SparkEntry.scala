package graft

import graft.ops.{Behavior, BehaviorOracle, Bloom, BloomOracle, Concentration, ConcentrationOracle, Curation, CurationOracle, Drift, DriftOracle, Graph, GraphOracle, Integrity, IntegrityOracle, Ledger, LedgerOracle, OracleSql, Recommend, RecommendOracle, Relational, Spans, SpansOracle, TimeSeries, TimeSeriesOracle}
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

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (Relational.all ++ Curation.all ++ Integrity.all ++ Behavior.all ++ TimeSeries.all ++ Graph.all ++ Drift.all ++ Spans.all ++ Concentration.all ++ Recommend.all ++ Ledger.all ++ Bloom.all).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    (OracleSql.all ++ CurationOracle.all ++ IntegrityOracle.all ++ BehaviorOracle.all ++ TimeSeriesOracle.all ++ GraphOracle.all ++ DriftOracle.all ++ SpansOracle.all ++ ConcentrationOracle.all ++ RecommendOracle.all ++ LedgerOracle.all ++ BloomOracle.all).toMap
}
