package graft

/** Inventory-integrity guard: the driver contract is only as good as
  * the registration — a query written but not wired into
  * `SparkEntry.queries`, or an oracle keyed to a missing/renamed query,
  * silently drops out of the correctness gate. Every entry runs once at
  * sf0.001 and must produce rows (the driver's smoke expectation).
  */
class InventorySpec extends SparkSpec {

  test("every oracle key has a query; keys are well-formed; no key collisions") {
    val qk = SparkEntry.queries.keySet
    val ok = SparkEntry.oracleSql.keySet
    assert((ok -- qk).isEmpty, s"oracles without queries: ${ok -- qk}")
    // ...and the direction the "N of N oracle-checked" claim rests on: a
    // query registered without an oracle silently drops out of the gate.
    assert((qk -- ok).isEmpty, s"queries without oracles: ${qk -- ok}")
    assert(qk.forall(_.matches("q\\d{2,3}_[a-z0-9_]+")), "malformed query key")
    // SparkEntry merges the source Seqs with `.toMap`, which keeps the
    // LAST entry on a duplicate key — a query or oracle defined in two
    // inventories would silently shadow its twin and drop out of the
    // gate. Compare the raw Seq sizes against the merged maps.
    import graft.ops.{Behavior, BehaviorOracle, Concentration, ConcentrationOracle, Curation, CurationOracle, Drift, DriftOracle, Graph, GraphOracle, Integrity, IntegrityOracle, Ledger, LedgerOracle, OracleSql, Recommend, RecommendOracle, Relational, Spans, SpansOracle, TimeSeries, TimeSeriesOracle}
    assert(Relational.all.size + Curation.all.size + Integrity.all.size + Behavior.all.size + TimeSeries.all.size + Graph.all.size + Drift.all.size + Spans.all.size + Concentration.all.size + Recommend.all.size + Ledger.all.size == SparkEntry.queries.size,
      "duplicate query key across the query inventories")
    assert(OracleSql.all.size + CurationOracle.all.size + IntegrityOracle.all.size + BehaviorOracle.all.size + TimeSeriesOracle.all.size + GraphOracle.all.size + DriftOracle.all.size + SpansOracle.all.size + ConcentrationOracle.all.size + RecommendOracle.all.size + LedgerOracle.all.size == SparkEntry.oracleSql.size,
      "duplicate oracle key across the oracle inventories")
    assert(Relational.all.map(_._1).distinct.size == Relational.all.size)
    assert(Curation.all.map(_._1).distinct.size == Curation.all.size)
    assert(Integrity.all.map(_._1).distinct.size == Integrity.all.size)
    assert(Behavior.all.map(_._1).distinct.size == Behavior.all.size)
    assert(OracleSql.all.map(_._1).distinct.size == OracleSql.all.size)
    assert(CurationOracle.all.map(_._1).distinct.size == CurationOracle.all.size)
    assert(IntegrityOracle.all.map(_._1).distinct.size == IntegrityOracle.all.size)
    assert(BehaviorOracle.all.map(_._1).distinct.size == BehaviorOracle.all.size)
    assert(TimeSeries.all.map(_._1).distinct.size == TimeSeries.all.size)
    assert(TimeSeriesOracle.all.map(_._1).distinct.size == TimeSeriesOracle.all.size)
    assert(Graph.all.map(_._1).distinct.size == Graph.all.size)
    assert(GraphOracle.all.map(_._1).distinct.size == GraphOracle.all.size)
    assert(Drift.all.map(_._1).distinct.size == Drift.all.size)
    assert(DriftOracle.all.map(_._1).distinct.size == DriftOracle.all.size)
    assert(Spans.all.map(_._1).distinct.size == Spans.all.size)
    assert(SpansOracle.all.map(_._1).distinct.size == SpansOracle.all.size)
    assert(Concentration.all.map(_._1).distinct.size == Concentration.all.size)
    assert(ConcentrationOracle.all.map(_._1).distinct.size == ConcentrationOracle.all.size)
    assert(Recommend.all.map(_._1).distinct.size == Recommend.all.size)
    assert(Ledger.all.map(_._1).distinct.size == Ledger.all.size)
    assert(LedgerOracle.all.map(_._1).distinct.size == LedgerOracle.all.size)
    assert(RecommendOracle.all.map(_._1).distinct.size == RecommendOracle.all.size)
  }

  test("every registered query executes at sf0.001 and returns rows") {
    initQuiet()
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, sf).count()
      if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"queries with zero rows at sf0.001: $empty")
  }

  test("flagship entry produces rows (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
