package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udf

/** The user-extension surface (SURVEY.md §2.3 A12): one shipped example
  * each of scalar UDF, typed UDAF (Aggregator), and a generator
  * ("UDTF" = array-returning function + explode).
  *
  * These are ESCAPE HATCHES, not the default: a Scala UDF is a codegen
  * black box (no pushdown through it, boxing per row). Engine operators
  * use Column expressions; users reach for these only when expressions
  * can't say it.
  */
object UserFunctions {

  /** Example scalar UDF: fnv-1a 64-bit hash of a string. */
  val fnv1a = udf { (s: String) =>
    if (s == null) null.asInstanceOf[java.lang.Long]
    else {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
      java.lang.Long.valueOf(h)
    }
  }

  /** Example typed UDAF: geometric mean via log-sum (stable buffer). */
  object GeoMean extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), x: Double): (Double, Long) =
      if (x > 0) (b._1 + math.log(x), b._2 + 1) else b
    def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    def finish(b: (Double, Long)): Double =
      if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
    def bufferEncoder: Encoder[(Double, Long)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Example generator ("UDTF"): string → array of (token, position)
    * structs; callers explode it. Pure function → pure expression
    * alternative exists (posexplode(split(...))); this demonstrates the
    * UDF-backed path for logic expressions can't reach.
    */
  val tokenizeWithPos = udf { (s: String) =>
    if (s == null) Array.empty[(String, Int)]
    else s.split(" ").zipWithIndex
  }

  /** Register all examples for SQL use (`SELECT fnv1a(text) ...`). */
  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("fnv1a", fnv1a)
    spark.udf.register("geo_mean", org.apache.spark.sql.functions.udaf(GeoMean))
    spark.udf.register("tokenize_pos", tokenizeWithPos)
  }
}
