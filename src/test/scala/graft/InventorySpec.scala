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
    // gate. The guard derives from SparkEntry.families — the SAME list
    // SparkEntry.queries/oracleSql consume — so adding a family to
    // SparkEntry automatically extends the guard (round-6 lesson: a
    // hand-maintained sum here went stale when the Bloom family landed).
    assert(SparkEntry.families.flatMap(_._2).size == SparkEntry.queries.size,
      "duplicate query key across the query inventories")
    assert(SparkEntry.families.flatMap(_._3).size == SparkEntry.oracleSql.size,
      "duplicate oracle key across the oracle inventories")
    SparkEntry.families.foreach { case (fam, qs, os) =>
      assert(qs.map(_._1).distinct.size == qs.size, s"duplicate query key within family $fam")
      assert(os.map(_._1).distinct.size == os.size, s"duplicate oracle key within family $fam")
    }
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
