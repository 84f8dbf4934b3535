package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Co-engagement similarity (SURVEY.md §2.3.1 extensions, q126):
  * item-item collaborative filtering over entity×item interaction
  * counts — the "customers who bought X also bought Y" readout.
  *
  * Scale shape: the pair fan-out comes from a self-join on the ENTITY
  * key, so each entity contributes C(|its items|, 2) pairs — bounded
  * by per-entity item diversity, never by corpus size (the q107
  * basket shape). Item norms are an |items|-bounded aggregate attached
  * by broadcast. For adversarial hot entities (one customer touching
  * every item), cap per-entity items first — the same head-cap lever
  * as q90's document frequency cut.
  */
object Recommend {

  private def orderedSmall(df: DataFrame, cols: Column*): DataFrame =
    df.coalesce(1).orderBy(cols: _*)

  /** Item-item cosine similarity over (entity, item, count) integer
    * interactions: cos(a,b) = Σ_e n_ea·n_eb / √(Σn_ea²·Σn_eb²). All
    * sums are exact integers; the final expression — CAST(dot) /
    * sqrt(CAST(na2)·CAST(nb2)) — is one closed double form both
    * engines evaluate identically. Pairs require `minEntities` common
    * entities (support floor). */
  def itemCosine(
      df: DataFrame, entityCol: String, itemCol: String, countCol: String,
      minEntities: Long = 1L): DataFrame = {
    val base = df.select(col(entityCol).as("__e"), col(itemCol).as("__i"),
      col(countCol).as("__n"))
    val norms = base.groupBy(col("__i"))
      .agg(sum(col("__n") * col("__n")).as("__n2"))
    val pairs = base.as("l")
      .join(base.as("r"),
        col("l.__e") === col("r.__e") && col("l.__i") < col("r.__i"))
      .groupBy(col("l.__i").as("item_a"), col("r.__i").as("item_b"))
      .agg(count(lit(1)).as("n_common"),
        sum(col("l.__n") * col("r.__n")).as("dot"))
      .filter(col("n_common") >= minEntities)
    pairs
      .join(broadcast(norms).withColumnRenamed("__i", "item_a")
        .withColumnRenamed("__n2", "__na2"), "item_a")
      .join(broadcast(norms).withColumnRenamed("__i", "item_b")
        .withColumnRenamed("__n2", "__nb2"), "item_b")
      .select(col("item_a"), col("item_b"), col("n_common"), col("dot"),
        round(col("dot").cast("double") /
          sqrt(col("__na2").cast("double") * col("__nb2").cast("double")),
          6).as("cosine"))
  }

  // --------------------------------------------------------------- q126

  /** q126 — "bought together" brand affinity: cosine similarity of
    * brand purchase-count vectors over customers (≥ 20 common
    * customers), top 50 pairs. */
  def itemCfQuery(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.load(spark, dir, "lineitem")
      .join(Tables.load(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.load(spark, dir, "part")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("o_custkey"), col("p_brand"))
      .agg(count(lit(1)).as("n"))
    orderedSmall(
      itemCosine(counts, "o_custkey", "p_brand", "n", minEntities = 20L),
      col("cosine").desc, col("item_a"), col("item_b"))
      .limit(50)
  }

  val all: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q126_item_cf" -> (itemCfQuery _))

  val allNames: Seq[String] = all.map(_._1)
}

/** DuckDB twins for [[Recommend]] (driver correctness gate). */
object RecommendOracle {

  val all: Seq[(String, String)] = Seq(
    // identical integer dot/norm sums; one closed-form double each
    "q126_item_cf" ->
      """WITH counts AS (
        |  SELECT o.o_custkey AS e, p.p_brand AS i, count(*) AS n
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY o.o_custkey, p.p_brand),
        |norms AS (SELECT i, sum(n * n) AS n2 FROM counts GROUP BY i),
        |pairs AS (
        |  SELECT l.i AS item_a, r.i AS item_b, count(*) AS n_common,
        |         sum(l.n * r.n) AS dot
        |  FROM counts l JOIN counts r ON l.e = r.e AND l.i < r.i
        |  GROUP BY l.i, r.i HAVING count(*) >= 20)
        |SELECT p.item_a, p.item_b, p.n_common,
        |       CAST(p.dot AS BIGINT) AS dot,
        |       round(CAST(p.dot AS DOUBLE) /
        |             sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)),
        |             6) AS cosine
        |FROM pairs p
        |JOIN norms na ON na.i = p.item_a
        |JOIN norms nb ON nb.i = p.item_b
        |ORDER BY cosine DESC, item_a, item_b LIMIT 50""".stripMargin)
}
