package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two
  * `array<double>` columns, fused into a single loop.
  *
  * Why an Expression and not the HOF composition in
  * [[graft.functions.VectorFunctions.cosine]]: the HOF form builds three
  * intermediate arrays and folds each (zip_with + 2×transform +
  * 3×aggregate); this computes dot, |a|² and |b|² in ONE traversal with
  * no allocation, and `doGenCode` emits a tight scalar loop that lives
  * inside whole-stage codegen. Preference order per the build rules:
  * compose built-ins (done, oracle path) → custom Expression (this, the
  * hot path) → UDF (never: boxing + codegen black box).
  *
  * Null elements are not expected (embeddings are dense); a null array
  * yields null via BinaryExpression's default null intolerance.
  *
  * A zero-norm operand yields 0.0, NOT NaN (0/0). Under Spark's
  * NaN-is-largest ordering semantics a NaN cosine satisfies every
  * `>= tau` threshold, so one all-zeros embedding would otherwise pair
  * with its whole cell in [[graft.vector.SemanticDedup]] and collapse
  * the cell into a single component. "No direction ⇒ similar to
  * nothing" is the only threshold-safe convention.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // AbstractDataType is private[sql]; the inferred Seq[ArrayType] conforms
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0d; var na = 0d; var nb = 0d
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0d) 0d else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i);
         |  double $y = $b.getDouble($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |double ${n}_denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = ${n}_denom == 0.0 ? 0.0 : $dot / ${n}_denom;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
