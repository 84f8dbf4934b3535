package graft.ops

import graft.SparkSpec

/** Plan-shape guards (SURVEY §5.2): the 100 TB posture is enforced as
  * assertions on physical plans — broadcast where intended, pushdown
  * reaching the scan, and exchange-count ceilings so a regression that
  * adds shuffles fails loudly.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, sf)
    df.collect() // materialize so AQE resolves to the final plan
    // AQE prints "== Final Plan ==" followed by "== Initial Plan ==";
    // keep only the final section or every exchange counts twice
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  /** Shuffle exchanges only — broadcasts are counted separately. */
  private def exchanges(p: String): Int =
    "Exchange (hash|range|Single)".r.findAllIn(p).size

  test("q03: dimension joins broadcast; no nested-loop or cartesian") {
    val p = plan("q03_join_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"), "expected broadcast joins for dims")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q02: filters push down to the parquet scan") {
    val p = plan("q02_filter_revenue")
    assert(p.contains("PushedFilters: [Is") || p.contains("PushedFilters: [Gr"),
      s"no pushed filters in:\n$p")
  }

  test("q01: column pruning reaches the scan (no full-width lineitem read)") {
    val p = plan("q01_pricing_summary")
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    val cols = read.split(",").length
    assert(cols <= 7, s"scan reads $cols columns: $read")
  }

  test("exchange-count ceilings hold (shuffle regression guard)") {
    val ceilings = Map(
      "q01_pricing_summary" -> 2,
      "q02_filter_revenue" -> 1,
      "q03_join_revenue_by_nation" -> 4,
      "q04_topk_orders" -> 1,
      "q11_sessionize" -> 2,
      "q14_tumbling_1h" -> 3,
      "q18_asof_join" -> 3)
    ceilings.foreach { case (q, max) =>
      val n = exchanges(plan(q))
      assert(n <= max, s"$q has $n exchanges (ceiling $max)")
    }
  }

  test("q33-q36: new inventory keeps sane physical shapes") {
    // q33: counts-side aggregate then an equi join — hash join, never a loop
    val p33 = plan("q33_correlated_count")
    assert(p33.contains("HashJoin"), s"q33 lost its hash join:\n$p33")
    assert(!p33.contains("CartesianProduct") && !p33.contains("BroadcastNestedLoopJoin"))
    // q34: all three frames share ONE window shuffle on o_custkey
    assert(exchanges(plan("q34_window_frames")) <= 2, "q34 window frames re-shuffled")
    // q35: pivot-style conditional agg is one aggregate pass — partial+final
    assert(exchanges(plan("q35_pivot_values")) <= 2, "q35 pivot gained extra shuffles")
    // q36: one join + one agg; both scans pruned to the 2 needed columns
    val p36 = plan("q36_ship_lag")
    "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(p36).foreach { m =>
      assert(m.group(1).split(",").length <= 2, s"q36 scan not pruned: ${m.group(1)}")
    }
  }

  test("q43-q47: round-3 inventory keeps sane physical shapes") {
    // q43 (r11 pre-aggregated): grouping sets = ONE Expand over the
    // (flag, status)-grain BASE aggregate — the Expand's ×3 row
    // multiplication must sit above a HashAggregate, never on the raw
    // scan; two aggregates (base + sets), two exchanges, and still not
    // a union of three aggregations over three scans
    val p43 = plan("q43_grouping_sets")
    assert(p43.contains("Expand"), s"q43 lost its Expand:\n$p43")
    assert("HashAggregate".r.findAllIn(p43).size <= 4, "q43 re-aggregated per set")
    assert(exchanges(p43) <= 2, "q43 gained extra shuffles")
    // the Expand input is the aggregated frame: every operator below
    // the Expand section must include the base HashAggregate
    val expandIdx = p43.indexOf("Expand")
    assert(p43.indexOf("HashAggregate", expandIdx) >= 0,
      s"q43 Expand no longer runs over the base aggregate:\n$p43")
    // q44: inverted-index join, never an all-pairs loop
    val p44 = plan("q44_overlap_pairs")
    assert(!p44.contains("CartesianProduct") && !p44.contains("BroadcastNestedLoopJoin"),
      s"q44 degenerated to a loop join:\n$p44")
    // q45 (r9 collapse-first shape): class aggregate (text shuffle) +
    // multiplicity join + per-span aggregate + global stats — two more
    // exchanges than the raw form, every one over distinct-content-
    // sized frames; the trade buys twin-factor-proof span explode
    // (ScaleCheck 100x row). Still no loop joins.
    val p45 = plan("q45_dup_spans")
    assert(exchanges(p45) <= 5, "q45 gained extra shuffles")
    assert(!p45.contains("CartesianProduct"), s"q45 loop join:\n$p45")
    // q47: bag set ops are aggregate-based, no loop joins
    val p47 = plan("q47_set_ops_all")
    assert(!p47.contains("CartesianProduct") && !p47.contains("BroadcastNestedLoopJoin"))
  }

  test("q48-q50: curation filters keep broadcast/narrow shapes") {
    // q48: percentile thresholds come back via BROADCAST — the corpus
    // side is never hash-repartitioned for the band filter
    val p48 = plan("q48_quantile_band")
    assert(p48.contains("BroadcastNestedLoopJoin") || p48.contains("BroadcastExchange"),
      s"q48 thresholds not broadcast:\n$p48")
    // q49/q50: one narrow map + one aggregate + the tiny final sort —
    // agg exchange + range exchange, nothing else
    assert(exchanges(plan("q49_repetition")) <= 2, "q49 gained extra shuffles")
    assert(exchanges(plan("q50_quality_filter")) <= 2, "q50 gained extra shuffles")
  }

  test("q51: decontamination joins broadcast — corpus never shuffled by n-gram") {
    val p = plan("q51_decontaminate")
    // benchmark n-grams reach the semi join via broadcast; contaminated
    // ids come back to the anti join via broadcast
    assert("BroadcastHashJoin.*LeftSemi".r.findFirstIn(p).isDefined,
      s"bench n-gram set not broadcast-semi-joined:\n$p")
    assert("BroadcastHashJoin.*LeftAnti".r.findFirstIn(p).isDefined,
      s"contaminated ids not broadcast-anti-joined:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // shuffles: 2 shingle repartitions + contaminated-id distinct + final
    // agg/sort — no n-gram-keyed corpus exchange
    assert(exchanges(p) <= 5, s"q51 gained extra shuffles:\n$p")
  }

  test("q52: packing prefix sum is bucket-parallel — no single-partition corpus window") {
    val p = plan("q52_pack_sequences")
    assert(p.contains("Window"), s"expected a window in:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"prefix sum collapsed to one partition:\n$p")
    assert("BroadcastHashJoin".r.findFirstIn(p).isDefined,
      s"bucket offsets not broadcast:\n$p")
  }

  test("q53: mixture thresholds are a literal filter — corpus never joined or shuffled pre-agg") {
    val p = plan("q53_source_mix")
    // thresholds arrive as a CASE WHEN literal chain, not a join
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"corpus shuffled for thresholds:\n$p")
    assert(exchanges(p) <= 3, s"q53 gained extra shuffles:\n$p")
  }

  test("q54: shuffle-order head is a TakeOrdered, not a global sort") {
    val p = plan("q54_epoch_shuffle")
    assert(p.contains("TakeOrderedAndProject"), s"top-k fell back to a full sort:\n$p")
  }

  test("q55-q70: round-3 additions keep sane physical shapes") {
    // q55: bloom pre-filter runs scan-side on the fact table via the
    // ONE-row broadcast word-map attach (round-7: the codegen probe —
    // the BroadcastNestedLoopJoin here is that single-row attach, the
    // q196 pattern, never a data×data loop); the join itself still
    // broadcasts the urgent-orders side
    val p55 = plan("q55_bloom_join")
    assert(p55.contains("BroadcastHashJoin"), s"q55 dim side not broadcast:\n$p55")
    assert(!p55.contains("CartesianProduct"))
    // q56: sliding window = one generate (window expansion) + one agg —
    // agg exchange + tiny final sort only, same budget as tumbling q14
    assert(exchanges(plan("q56_sliding_30m")) <= 3, "q56 gained extra shuffles")
    // q57: chunking is a narrow generate; only the per-source agg (+
    // final small sort) shuffles
    assert(exchanges(plan("q57_chunk_stats")) <= 2, "q57 gained extra shuffles")
    // q58: the sample is a scan-side literal filter — no join, no extra
    // exchange beyond agg + final sort
    val p58 = plan("q58_det_sample")
    assert(!p58.contains("Join"), s"q58 sampling must not join:\n$p58")
    assert(exchanges(p58) <= 2, "q58 gained extra shuffles")
    // q59: one aggregate pass (power sums) + final projection
    assert(exchanges(plan("q59_moments")) <= 2, "q59 gained extra shuffles")
    // q60: latest-by-key is ONE partial-aggregating hash agg — no window
    // (which would sort every row) and no extra exchange
    val p60 = plan("q60_latest_events")
    assert(!p60.contains("Window"), s"q60 fell back to a window sort:\n$p60")
    assert(exchanges(p60) <= 2, "q60 gained extra shuffles")
    // q61: single-pass aggregate battery (distinct agg adds one expand
    // pass, still bounded)
    assert(exchanges(plan("q61_null_semantics")) <= 3, "q61 gained extra shuffles")
    // q64: decorrelated Q21 — aggregates + equi joins only, never a
    // per-row subquery loop
    val p64 = plan("q64_late_alone")
    assert(!p64.contains("CartesianProduct") && !p64.contains("BroadcastNestedLoopJoin"),
      s"q64 planned a loop join:\n$p64")
    // q65: outer join runs on two PRE-AGGREGATED key-sized inputs
    val p65 = plan("q65_full_outer")
    assert(p65.contains("FullOuter"), s"q65 lost its full outer join:\n$p65")
    // q66: cap = source-keyed window + agg — no join, bounded exchanges
    val p66 = plan("q66_source_cap")
    assert(p66.contains("Window") && !p66.contains("Join"),
      s"q66 shape changed:\n$p66")
    assert(exchanges(p66) <= 3, "q66 gained extra shuffles")
    // q67: by-name union then ONE aggregate — never a join across the seam
    val p67 = plan("q67_schema_drift")
    assert(p67.contains("Union") && !p67.contains("Join"),
      s"q67 shape changed:\n$p67")
    assert(exchanges(p67) <= 2, "q67 gained extra shuffles")
    // q68/q69: bench n-grams / vocabulary travel by BROADCAST — the
    // corpus is never shuffled by n-gram or token for the join
    assert(plan("q68_contamination_report").contains("BroadcastHashJoin"),
      "q68 bench side not broadcast")
    assert(plan("q69_unigram_nll").contains("BroadcastHashJoin"),
      "q69 vocabulary not broadcast")
    // q70: the spine join is a keyed equi-join — no loop join of any kind
    val p70 = plan("q70_gap_fill")
    assert(!p70.contains("CartesianProduct") && !p70.contains("BroadcastNestedLoopJoin"),
      s"q70 planned a loop join:\n$p70")
  }

  test("q24/q31/q71/q72: round-4 additions keep sane physical shapes") {
    // q24: banded self-join on (chunk, chunk-key) — an equi join, never
    // an all-pairs loop; one exchange for the band key join + dedup +
    // final sort
    val p24 = plan("q24_dedup_simhash")
    assert(!p24.contains("CartesianProduct") && !p24.contains("BroadcastNestedLoopJoin"),
      s"q24 degenerated to a loop join:\n$p24")
    // q31: exact + approx distinct in ONE aggregate pass over events —
    // no second scan for the exact side
    val p31 = plan("q31_approx_distinct")
    assert("HashAggregate".r.findAllIn(p31).size <= 4, // partial+final × expand pass
      s"q31 re-scanned for exact/approx:\n$p31")
    assert(!p31.contains("Join"), s"q31 must not join:\n$p31")
    // q71: decimal agg is still one partial+final aggregate, pruned scan
    val p71 = plan("q71_decimal_pricing")
    assert(exchanges(p71) <= 2, s"q71 gained extra shuffles:\n$p71")
    val read71 = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p71).map(_.group(1)).getOrElse("")
    assert(read71.split(",").length <= 4, s"q71 scan not pruned: $read71")
    // q72: map explode is a narrow generate — only the agg (+ final
    // small sort) shuffles
    val p72 = plan("q72_map_entries")
    assert(p72.contains("Generate"), s"q72 lost its explode:\n$p72")
    assert(exchanges(p72) <= 2, s"q72 gained extra shuffles:\n$p72")
  }

  test("q75-q78: round-5 additions keep sane physical shapes") {
    // q75: doc-frequency is ONE ngram-key shuffle (array_distinct before
    // the explode — no countDistinct double shuffle); the boilerplate
    // set joins broadcast; positions never cartesian
    val p75 = plan("q75_boilerplate")
    assert(!p75.contains("CartesianProduct") && !p75.contains("BroadcastNestedLoopJoin"),
      s"q75 degenerated to a loop join:\n$p75")
    assert(!p75.contains("countDistinct") && !p75.toLowerCase.contains("distinct(doc_id"),
      s"q75 doc frequency fell back to countDistinct:\n$p75")
    assert(exchanges(p75) <= 4, s"q75 gained extra shuffles:\n$p75")
    // q76: the total-mass scalar is a narrow scan (no second token
    // explode+shuffle); the CMS table and candidate estimates join
    // broadcast. The scalar-threshold cross is the allowlisted
    // broadcast-scalar BNLJ (same as q48).
    val p76 = plan("q76_heavy_hitters")
    assert(!p76.contains("CartesianProduct"), s"q76 cartesian:\n$p76")
    assert("Generate explode\\(split".r.findAllIn(p76).size == 2,
      s"q76 must explode the corpus exactly twice (exact counts + sketch):\n$p76")
    // q77: pure narrow projection + TakeOrdered — NO exchange at all
    val p77 = plan("q77_weighted_sample")
    assert(p77.contains("TakeOrderedAndProject"), s"q77 lost its top-k:\n$p77")
    assert(exchanges(p77) == 0, s"q77 must not shuffle:\n$p77")
    // q78: sketch + rank-check joins stay broadcast; no loop join
    val p78 = plan("q78_quantile_sketch")
    assert(!p78.contains("CartesianProduct") && !p78.contains("BroadcastNestedLoopJoin"),
      s"q78 degenerated to a loop join:\n$p78")
    assert(p78.contains("percentile_approx"), s"q78 lost the sketch:\n$p78")
  }

  test("q79-q83: temporal operators keep single-entity-key-shuffle shapes") {
    // q79: scd2's lag-compress and version windows SHARE one user_id
    // hash exchange; budget = that + agg partial/final + final sort.
    // Never a cartesian/loop join, never a single-partition corpus sort.
    val p79 = plan("q79_scd2")
    assert(!p79.contains("CartesianProduct") && !p79.contains("BroadcastNestedLoopJoin"),
      s"q79 planned a loop join:\n$p79")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p79).size <= 1,
      s"q79 re-shuffled by entity key:\n$p79")
    assert(!p79.contains("Exchange SinglePartition"),
      s"q79 collapsed the corpus to one partition:\n$p79")
    assert(exchanges(p79) <= 3, s"q79 gained extra shuffles:\n$p79")
    // q80: funnel = ONE user-keyed collect_list aggregate, then all
    // per-step work happens on the ≤|steps|-row aggregate (the step
    // spine joins broadcast). No join per funnel step on the corpus.
    val p80 = plan("q80_funnel")
    assert(!p80.contains("CartesianProduct"), s"q80 cartesian:\n$p80")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p80).size <= 1,
      s"q80 shuffled the corpus more than once by user:\n$p80")
    assert("SortMergeJoin".r.findAllIn(p80).isEmpty,
      s"q80 step spine fell back to a corpus-sized SMJ:\n$p80")
    // q81: cohort = first-seen window + distinct + count, all keyed work
    // behind a single user exchange; never a loop join
    val p81 = plan("q81_cohort_retention")
    assert(!p81.contains("CartesianProduct") && !p81.contains("BroadcastNestedLoopJoin"),
      s"q81 planned a loop join:\n$p81")
    assert("Exchange hashpartitioning\\(_u".r.findAllIn(p81).size <= 1,
      s"q81 re-shuffled by entity key:\n$p81")
    assert(exchanges(p81) <= 4, s"q81 gained extra shuffles:\n$p81")
    // q83: point-in-time = scd2's user exchange + ONE as-of union-window
    // user exchange + the small agg — never the naive range join (which
    // would plan each key's (fact, version) cross as a loop-ish filter)
    val p83 = plan("q83_pit_enrichment")
    assert(!p83.contains("CartesianProduct") && !p83.contains("BroadcastNestedLoopJoin"),
      s"q83 planned a loop join:\n$p83")
    assert(!p83.contains("SortMergeJoin"),
      s"q83 fell back to a fact-sized range join:\n$p83")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p83).size <= 2,
      s"q83 re-shuffled by entity key more than scd2+asof:\n$p83")
    assert(exchanges(p83) <= 4, s"q83 gained extra shuffles:\n$p83")
  }

  test("q62 window and scalable forms agree at reporting precision") {
    // the size guard swaps the 5-task window for block-parallel
    // cumulative counts above WindowBatteryMaxRows — the two paths
    // must render identical rows (tie-invariant closed forms)
    val orders = graft.Tables.load(spark, sf, "orders")
    val a = Relational.q62Window(orders).collect().map(_.toString).toSeq
    val b = Relational.q62Scalable(orders).collect().map(_.toString).toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("whole-stage codegen covers the relational inventory hot paths") {
    // codegen'd operators print as "*(n) Op" in the plan string
    Seq("q01_pricing_summary", "q02_filter_revenue", "q13_cosine_topk").foreach { q =>
      assert("""\*\(\d+\)""".r.findFirstIn(plan(q)).isDefined, s"$q fell out of codegen")
    }
  }
}
