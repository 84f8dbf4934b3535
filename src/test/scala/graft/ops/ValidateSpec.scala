package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Constraint checks: null-safe violation semantics, lossless routing,
  * duplicate keys, and FK orphans. */
class ValidateSpec extends SparkSpec {
  import spark.implicits._

  private val rules = Seq(
    Validate.notNull("name"),
    Validate.inRange("score", 0, 100),
    Validate.matches("name", "^[a-z]+$"))

  test("annotate: null predicates count as violations; clean rows empty") {
    initQuiet()
    val df = Seq(
      (1L, Some("alice"), Some(50.0)),   // clean
      (2L, None, Some(10.0)),            // not_null fails; rlike(null)=null -> violation too
      (3L, Some("Bob99"), Some(200.0)),  // regex + range fail
      (4L, Some("carol"), None)          // range on null -> null -> violation
    ).toDF("id", "name", "score")
    val v = Validate.annotate(df, rules)
      .select(col("id"), col("violations"))
      .as[(Long, Seq[String])].collect().toMap
    assert(v(1L).isEmpty)
    assert(v(2L).toSet == Set("not_null_name", "matches_name"))
    assert(v(3L).toSet == Set("range_score", "matches_name"))
    assert(v(4L) == Seq("range_score"))
  }

  test("split is lossless: clean ∪ violating = input") {
    val df = Seq(
      (1L, Some("alice"), Some(50.0)),
      (2L, None, Some(10.0)),
      (3L, Some("bob"), Some(99.0))).toDF("id", "name", "score")
    val (ok, bad) = Validate.split(df, rules)
    assert(ok.count() + bad.count() == df.count())
    assert(ok.columns.toSeq == df.columns.toSeq, "clean side schema changed")
    assert(bad.columns.contains("violations"))
    assert(ok.select("id").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("duplicateKeys flags exactly the multiplied keys") {
    val df = Seq((1L, "a"), (2L, "b"), (2L, "b"), (3L, "c"), (2L, "b"))
      .toDF("k", "v")
    val dup = Validate.duplicateKeys(df, Seq("k", "v"))
      .as[(Long, String, Long)].collect()
    assert(dup.toSeq == Seq((2L, "b", 3L)))
    // corpus primary keys really are unique
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assert(Validate.duplicateKeys(docs, Seq("doc_id")).count() == 0,
      "doc_id must be unique")
    assert(Validate.duplicateKeys(docs, Seq("source")).count() >= 1,
      "source is shared by many docs — must be flagged as non-unique")
  }

  test("orphans: referential integrity holds on the corpus; injected orphan caught") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    assert(Validate.orphans(li, "l_orderkey", orders, "o_orderkey").count() == 0,
      "corpus lineitem->orders FK should hold")
    val poisoned = li.select(col("l_orderkey"))
      .unionByName(Seq(-999L, -999L).toDF("l_orderkey"))
    val o = Validate.orphans(poisoned, "l_orderkey", orders, "o_orderkey")
      .as[(Long, Long)].collect()
    assert(o.toSeq == Seq((-999L, 2L)))
    // null FKs are not orphans
    val withNull = li.select(col("l_orderkey"))
      .unionByName(Seq[Option[Long]](None).toDF("l_orderkey"))
    assert(Validate.orphans(withNull, "l_orderkey", orders, "o_orderkey").count() == 0)
  }
}
