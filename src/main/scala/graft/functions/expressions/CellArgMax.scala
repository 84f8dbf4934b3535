package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression: index of the max-cosine centroid for an
  * `array<double>` vector against a LITERAL `array<array<double>>`
  * centroid table — the fused form of
  * [[graft.vector.Similarity.cellAssignment]]'s
  * `greatest(struct(cosine_sim(v, c_i), i) ...)` composition.
  *
  * Why an Expression: the greatest-over-structs form evaluates
  * `numCells` struct constructions plus `numCells − 1` struct-ordering
  * comparisons PER ROW — at numCells = 64 that allocated ~64
  * InternalRows per input row and dominated IVF index builds (r9
  * measured the 200k×64-dim build at ~178 s; the assignment loop here
  * is one pass with zero allocation). Semantics are IDENTICAL by
  * construction and spec-pinned (CellArgMaxSpec): per centroid the
  * cosine is computed with the exact [[CosineSimilarity]] arithmetic
  * (ordered accumulation, `sqrt(na)·sqrt(nb)` denominator, zero-norm →
  * 0.0), per-centroid `sqrt(nb)` is hoisted to expression init (the
  * same double — sqrt of the same ordered sum), and ties keep the
  * greatest-struct rule: the LARGER cell index wins (`>=` update).
  *
  * The centroid argument must be foldable (centroids are driver-side
  * literals by design — KBs of doubles baked into the plan, no model
  * state shipped); vector/centroid dims must be EQUAL — enforced per
  * row in [[assign]] (r9 ADVICE: the old min-length loop truncated the
  * dot but not the norms on mismatched widths, matching neither
  * CosineSimilarity nor the composed reference). NaN handling is
  * documented at the comparison site in [[assign]].
  */
case class CellArgMax(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(ArrayType(DoubleType)))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "cell_argmax"

  @transient private lazy val cents: Array[Array[Double]] = {
    require(right.foldable, "cell_argmax centroids must be a literal")
    val ad = right.eval(null).asInstanceOf[ArrayData]
    val cs = Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
    require(cs.nonEmpty && cs.forall(_.length == cs(0).length),
      "cell_argmax centroids must be non-empty and equal-length")
    cs
  }
  @transient private lazy val centDim: Int = cents(0).length
  // sqrt of the ordered element-square sum — bit-identical to the
  // per-eval accumulation CosineSimilarity would do for this operand
  @transient private lazy val sqrtNorms: Array[Double] = cents.map { c =>
    var nb = 0.0; var j = 0
    while (j < c.length) { nb += c(j) * c(j); j += 1 }
    math.sqrt(nb)
  }

  /** Shared by eval and the codegen'd twin (called reflectively from
    * generated code via the reference object). */
  def assign(x: ArrayData): Int = {
    val n = x.numElements()
    // fail fast on a width-mismatched vector (r9 ADVICE): the old
    // min-length loop silently computed a TRUNCATED dot against a
    // full-length query norm — neither CosineSimilarity's semantics
    // (min-length on ALL three accumulations) nor the composed
    // greatest-struct reference. Callers dim-guard upstream
    // (requireDim), so this is a one-int-compare backstop per row.
    if (n != centDim)
      throw new IllegalArgumentException(
        s"cell_argmax: vector has $n elements, centroids have $centDim")
    var na = 0.0
    var i = 0
    while (i < n) { val xi = x.getDouble(i); na += xi * xi; i += 1 }
    val sqrtNa = math.sqrt(na)
    var best = Double.NegativeInfinity
    var bestCell = 0
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var dot = 0.0
      var j = 0
      while (j < n) { dot += x.getDouble(j) * cent(j); j += 1 }
      val denom = sqrtNa * sqrtNorms(c)
      val sim = if (denom == 0.0) 0.0 else dot / denom
      // ties: larger index (the greatest-struct rule). NaN RULE: a NaN
      // sim (NaN input coordinates) never wins under `>=` — every
      // comparison with NaN is false — so the result is the last cell
      // with a non-NaN sim (or cell 0 if all are NaN). The composed
      // greatest-struct reference instead treats NaN as LARGEST; the
      // two deliberately diverge there, and the divergence is
      // unreachable through graft's entry points (requireDim'd finite
      // embeddings). Documented rather than matched: matching would
      // put a NaN check in the hot loop to reproduce behavior no
      // caller wants.
      if (sim >= best) { best = sim; bestCell = c }
      c += 1
    }
    bestCell
  }

  override def nullSafeEval(v: Any, cs: Any): Any =
    assign(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _) => {
      // one reference object, one virtual call per row: the tight loop
      // lives in compiled Scala, not in a giant generated method (the
      // greatest-struct form used to blow past inlining thresholds)
      val self = ctx.addReferenceObj("cellArgMax", this,
        classOf[CellArgMax].getName)
      s"${ev.value} = $self.assign($v);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CellArgMax =
    copy(left = newLeft, right = newRight)
}
