package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pin: a partitioned layout ([[IO.writePartitioned]]) joined to a
  * selectively-filtered dimension plans a DYNAMIC partition-pruning
  * filter on the fact scan — the runtime analogue of static partition
  * pruning, and at 100 TB the difference between scanning the two
  * partitions the dim selects and scanning all of them. This is plan
  * posture the engine RELIES on for partitioned fact tables; pinning
  * it catches a config or layout regression that would silently turn
  * pruned scans into full scans.
  */
class DppSpec extends SparkSpec {

  import spark.implicits._

  test("partitioned fact + filtered dim join plans dynamic partition pruning") {
    initQuiet()
    val dir = java.nio.file.Files.createTempDirectory("dpp_fact").toString
    val li = graft.Tables.load(spark, sf, "lineitem")
      .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
    IO.writePartitioned(li, dir, Seq("ship_month"))
    val fact = spark.read.parquet(dir)
    val nMonths = fact.select("ship_month").distinct().count()
    assert(nMonths > 3, s"fixture needs several partitions, got $nMonths")

    // dim carries ALL months but flags only 2 as "keep": the selective
    // predicate lives on the dim side only — static pruning cannot
    // help, DPP must. The flag must VARY (a constant would fold away
    // and leave no selective build-side predicate for the DPP
    // heuristic to act on). The dim is written to parquet: DPP's
    // benefit estimate needs a sized relation, not a LocalRelation.
    val months = fact.select("ship_month").distinct()
      .orderBy("ship_month").as[String].collect()
    val keep = months.take(2)
    val dimDir = java.nio.file.Files.createTempDirectory("dpp_dim").toString
    months.toSeq.toDF("m")
      .withColumn("flag", when(col("m").isin(keep.toSeq: _*), "keep").otherwise("drop"))
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("flag") === "keep")

    val joined = fact.join(dim, fact("ship_month") === dim("m"))
      .groupBy(col("ship_month")).agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning in plan:\n$plan")

    // and the pruned result equals the unpartitioned filter
    val got = joined.orderBy("ship_month").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val want = li.filter(col("ship_month").isin(keep.toSeq: _*))
      .groupBy("ship_month").agg(count(lit(1)).as("n"))
      .orderBy("ship_month").collect().map(r => r.getString(0) -> r.getLong(1))
    assert(got.sameElements(want))
  }
}
