package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit pins for the temporal family's edge semantics — the cases the
  * corpus fixture cannot exercise (zero-conversion funnel steps,
  * duplicate timestamps, null attribute runs, facts before the first
  * dimension version). The corpus-level behavior is oracle-checked by
  * q79–q81/q83.
  */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Long) = new java.sql.Timestamp(s * 1000)

  test("scd2: consecutive duplicate states compress; null runs are ONE version") {
    val changes = Seq(
      (1L, t(10), Some("a")), (1L, t(20), Some("a")), (1L, t(30), Some("b")),
      (1L, t(40), None), (1L, t(50), None), (1L, t(60), Some("a")),
      (2L, t(5), Some("x")))
      .toDF("k", "ts", "attr")
    val out = Temporal.scd2(changes, "k", "ts", Seq("attr"))
      .orderBy("k", "version").collect()
    // k=1: a(10..30) b(30..40) null(40..60) a(60..) — 4 versions, not 6
    val k1 = out.filter(_.getLong(0) == 1L)
    assert(k1.map(_.getAs[Int]("version")).toSeq == Seq(1, 2, 3, 4))
    assert(k1.map(r => Option(r.getAs[String]("attr"))).toSeq ==
      Seq(Some("a"), Some("b"), None, Some("a")))
    assert(k1.map(r => Option(r.getAs[java.sql.Timestamp]("valid_to"))).toSeq ==
      Seq(Some(t(30)), Some(t(40)), Some(t(60)), None))
    assert(k1.map(_.getAs[Boolean]("is_current")).toSeq ==
      Seq(false, false, false, true))
    assert(out.filter(_.getLong(0) == 2L).map(_.getAs[Boolean]("is_current")).toSeq ==
      Seq(true))
  }

  test("funnelDepth: strictly-later matching; same-ts step does not advance") {
    val ev = Seq(
      // user 1: clean a->b->c
      (1L, t(1), "a"), (1L, t(2), "b"), (1L, t(3), "c"),
      // user 2: b at the SAME ts as a — strict > means depth stops at 1
      (2L, t(1), "a"), (2L, t(1), "b"),
      // user 3: steps out of order never match (b before a)
      (3L, t(1), "b"), (3L, t(2), "a"),
      // user 4: no funnel events at all -> absent from output
      (4L, t(1), "zzz"))
      .toDF("u", "ts", "et")
    val depths = Temporal.funnelDepth(ev, "u", "ts", "et", Seq("a", "b", "c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(depths == Map(1L -> 3, 2L -> 1, 3L -> 1))
  }

  test("funnelSteps: zero-user steps still emit rows; conv null when step 1 empty") {
    val ev = Seq((1L, t(1), "a"), (2L, t(1), "a")).toDF("u", "ts", "et")
    val steps = Temporal.funnelSteps(ev, "u", "ts", "et", Seq("a", "b", "c"))
      .collect()
    assert(steps.length == 3, "every step must emit a row")
    assert(steps.map(_.getAs[Long]("n_users")).toSeq == Seq(2L, 0L, 0L))
    assert(steps.map(_.getAs[String]("step")).toSeq == Seq("a", "b", "c"))
    assert(steps.head.getAs[Double]("conv") == 1.0)
    assert(steps(1).getAs[Double]("conv") == 0.0)

    // nobody reaches step 1 at all -> all-zero counts, conv NULL not Inf
    val none = Temporal.funnelSteps(ev, "u", "ts", "et", Seq("x", "y"))
      .collect()
    assert(none.map(_.getAs[Long]("n_users")).toSeq == Seq(0L, 0L))
    assert(none.forall(_.isNullAt(3)), "conv must be NULL on an empty funnel")
  }

  test("cohortRetention: first-seen week buckets and offsets") {
    val wk = 7L * 24 * 3600
    // Jan 5 1970 was a Monday: ts 4d..(4d + n weeks) lands on known weeks
    val mon = 4L * 24 * 3600
    val ev = Seq(
      (1L, t(mon)), (1L, t(mon + wk)),          // cohort w0, active w0+w1
      (2L, t(mon + wk)), (2L, t(mon + 3 * wk)), // cohort w1, active w1+w3
      (3L, t(mon)))                             // cohort w0, active w0
      .toDF("u", "ts")
    val out = Temporal.cohortRetention(ev, "u", "ts")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(out.toSet == Set(
      ("1970-01-05", 0L, 2L), ("1970-01-05", 1L, 1L),
      ("1970-01-12", 0L, 1L), ("1970-01-12", 2L, 1L)))
  }

  test("pointInTime: version valid at fact ts; inclusive start; pre-history null") {
    val changes = Seq(
      (1L, t(10), "bronze"), (1L, t(20), "silver"), (1L, t(30), "gold"))
      .toDF("k", "ts", "tier")
    val dim = Temporal.scd2(changes, "k", "ts", Seq("tier"))
    val facts = Seq(
      (1L, t(5), 1.0),   // before any version -> null
      (1L, t(10), 2.0),  // AT valid_from -> the new version (inclusive)
      (1L, t(25), 3.0),  // mid-version
      (1L, t(99), 4.0),  // open current version
      (2L, t(50), 5.0))  // key with no dimension rows -> null, row kept
      .toDF("k", "ts", "v")
    val out = Temporal.pointInTime(facts, dim, Seq("k"), "ts",
        Seq("tier" -> "tier", "version" -> "ver"))
      .orderBy("k", "ts").collect()
    assert(out.length == 5, "left-join contract: every fact kept")
    assert(out.map(r => Option(r.getAs[String]("tier"))).toSeq ==
      Seq(None, Some("bronze"), Some("silver"), Some("gold"), None))
    assert(Option(out(2).getAs[Integer]("ver")) == Some(2))
  }

  test("windowedFunnelDepth: window bound from first-touch anchor") {
    val ev = Seq(
      // user 1: all steps inside the 10 s window -> depth 3
      (1L, t(1), "a"), (1L, t(2), "b"), (1L, t(3), "c"),
      // user 2: c lands 11 s after the anchor -> window cuts depth at 2
      (2L, t(1), "a"), (2L, t(2), "b"), (2L, t(12), "c"),
      // user 3: a SECOND signup inside the window does NOT re-anchor —
      // b at t(15) is within 10 s of the second a (t(8)) but not the
      // first (t(1)) -> depth stays 1
      (3L, t(1), "a"), (3L, t(8), "a"), (3L, t(15), "b"),
      // user 4: boundary: b exactly AT anchor+10 s is inclusive
      (4L, t(1), "a"), (4L, t(11), "b"))
      .toDF("u", "ts", "et")
    val depths = Temporal
      .windowedFunnelDepth(ev, "u", "ts", "et", Seq("a", "b", "c"), 10L)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(depths == Map(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 2))
    // a window wide enough to admit everything reduces to funnelDepth
    val wide = Temporal
      .windowedFunnelDepth(ev, "u", "ts", "et", Seq("a", "b", "c"), 3600L)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val plain = Temporal.funnelDepth(ev, "u", "ts", "et", Seq("a", "b", "c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(wide == plain)
  }
}
