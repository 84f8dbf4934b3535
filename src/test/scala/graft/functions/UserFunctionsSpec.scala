package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UserFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("scalar UDF: fnv1a is deterministic and SQL-registrable") {
    UserFunctions.registerAll(spark)
    val df = Seq("alpha", "beta", "alpha").toDF("s")
    val viaApi = df.select(UserFunctions.fnv1a(col("s"))).collect().map(_.getLong(0))
    assert(viaApi(0) == viaApi(2) && viaApi(0) != viaApi(1))
    df.createOrReplaceTempView("t_fnv")
    val viaSql = spark.sql("SELECT fnv1a(s) FROM t_fnv").collect().map(_.getLong(0))
    assert(viaApi.toSeq == viaSql.toSeq)
  }

  test("typed UDAF: geometric mean") {
    UserFunctions.registerAll(spark)
    val df = Seq(("a", 2.0), ("a", 8.0), ("b", 3.0)).toDF("k", "v")
    df.createOrReplaceTempView("t_geo")
    val m = spark.sql("SELECT k, geo_mean(v) g FROM t_geo GROUP BY k ORDER BY k")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(m("a") - 4.0) < 1e-9) // sqrt(2*8)
    assert(math.abs(m("b") - 3.0) < 1e-9)
  }

  test("generator UDF: tokenize with positions explodes to rows") {
    val df = Seq((1L, "x y z")).toDF("id", "text")
      .select(col("id"), explode(UserFunctions.tokenizeWithPos(col("text"))).as("tok"))
      .select(col("id"), col("tok._1").as("token"), col("tok._2").as("pos"))
    val rows = df.collect().map(r => (r.getString(1), r.getInt(2)))
    assert(rows.toSeq == Seq(("x", 0), ("y", 1), ("z", 2)))
  }
}
