package graft

import org.apache.spark.sql.functions._

/** E2 entry point (SURVEY §3.2): registered temp views + `spark.sql`
  * must agree with the DataFrame API plans (same engine, same results).
  */
class SqlEntrySpec extends SparkSpec {

  test("registerAll exposes every corpus table to SQL") {
    Tables.registerAll(spark, sf)
    Tables.names.foreach { n =>
      assert(spark.sql(s"SELECT count(*) FROM $n").head.getLong(0) > 0, n)
    }
  }

  test("SQL string and DataFrame API produce identical results (Q01 shape)") {
    Tables.registerAll(spark, sf)
    val viaSql = spark.sql(
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) sum_qty
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin).collect()
    val viaApi = Tables.load(spark, sf, "lineitem")
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-01")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("l_returnflag"), col("l_linestatus")).collect()
    assert(viaSql.sameElements(viaApi))
  }

  test("term frequency + document frequency are consistent") {
    import spark.implicits._
    val docs = Seq((1L, "a b a c"), (2L, "a d")).toDF("doc_id", "text")
    val tf = graft.text.TextAnalysis.termFrequency(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(tf((1L, "a")) == 2 && tf((1L, "b")) == 1 && tf((2L, "a")) == 1)
    val df = graft.text.TextAnalysis.documentFrequency(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(df("a") == 2 && df("b") == 1 && df("d") == 1)
  }
}
