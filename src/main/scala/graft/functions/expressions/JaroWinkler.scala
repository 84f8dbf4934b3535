package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Jaro-Winkler similarity of two string
  * columns — the fuzzy-name-matching scorer Spark lacks as a built-in
  * (Spark ships only `levenshtein`).
  *
  * Conventions are pinned to DuckDB's `jaro_winkler_similarity`
  * (verified by a 3000-case randomized cross-engine fuzz before this
  * was written, and continuously by the q125 oracle):
  *  - either side empty → 0.0 (including both empty);
  *  - match window = max(⌊max(|a|,|b|)/2⌋ − 1, 0);
  *  - transpositions = half the count of matched-but-misordered pairs;
  *  - Winkler prefix boost `j + ℓ·0.1·(1−j)` with ℓ = common prefix
  *    capped at 4, applied only when jaro STRICTLY exceeds 0.7.
  *
  * Comparison is byte-wise over the UTF-8 encoding (what DuckDB's C++
  * loop does); for ASCII corpora this is character-exact.
  *
  * The scorer is a static method the generated code calls directly
  * (the same shape as Spark's own `levenshtein`): the per-row flag
  * arrays make fully-inlined codegen pointless, but the call stays
  * inside whole-stage codegen with no boxing and no UDF dispatch.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.sim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expressions.JaroWinkler.sim($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Jaro-Winkler similarity over UTF-8 bytes; see class doc for the
    * pinned conventions. */
  def sim(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.getBytes
    val b = ub.getBytes
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && a(i) == b(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk the matched bytes of both sides in order
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - t) / md) / 3.0
    if (jaro > 0.7) {
      var l = 0
      val pmax = math.min(4, math.min(l1, l2))
      while (l < pmax && a(l) == b(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }
}
