package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: the query-side ADC lookup table for
  * product quantization. For an `array<double>` query vector and a
  * LITERAL `array<array<array<double>>>` codebook table (m × ksub ×
  * dsub), returns the FLATTENED `array<double>` of length m·ksub with
  * `lut[j·ksub + k] = dot(q_j, book_j[k])` — the per-subspace inner
  * products asymmetric distance computation sums per candidate:
  * `dot(q, reconstruction(codes)) = Σ_j lut[j·ksub + codes_j]`.
  *
  * Why an Expression: the composed form is m·ksub unrolled
  * `aggregate(zip_with(slice(...)))` chains — at (8, 64) that is 512
  * generated sub-expressions, past whole-stage codegen's method-size
  * comfort, for what is one tight loop here. The LUT is evaluated once
  * per QUERY row (the small side); candidates then pay only m
  * element_at lookups each, so the per-candidate cost is independent
  * of dsub — the whole point of ADC.
  *
  * Dots accumulate in coordinate order (exact on the oracle's integer
  * grid). Vector length must equal m·dsub — enforced per row, the
  * [[CellArgMax]]/[[PqEncode]] fail-fast rule.
  */
case class PqLut(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(ArrayType(DoubleType), ArrayType(ArrayType(ArrayType(DoubleType))))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"

  @transient private lazy val books: Array[Array[Array[Double]]] = {
    require(right.foldable, "pq_lut codebooks must be a literal")
    val ad = right.eval(null).asInstanceOf[ArrayData]
    val bs = Array.tabulate(ad.numElements()) { j =>
      val sub = ad.getArray(j)
      Array.tabulate(sub.numElements())(k => sub.getArray(k).toDoubleArray())
    }
    require(bs.nonEmpty && bs.forall(_.nonEmpty),
      "pq_lut codebooks must have >=1 subspace and >=1 codeword each")
    val dsub = bs(0)(0).length
    require(dsub > 0 && bs.forall(_.forall(_.length == dsub)),
      "pq_lut codewords must be non-empty and equal-length")
    require(bs.forall(_.length == bs(0).length),
      "pq_lut subspaces must have equal codeword counts (ksub)")
    bs
  }
  @transient private lazy val ksub: Int = books(0).length
  @transient private lazy val dsub: Int = books(0)(0).length
  @transient private lazy val dim: Int = books.length * dsub

  /** Shared by eval and the codegen'd twin. */
  def lut(x: ArrayData): ArrayData = {
    val n = x.numElements()
    if (n != dim)
      throw new IllegalArgumentException(
        s"pq_lut: vector has $n elements, codebooks cover $dim " +
          s"(${books.length} x $dsub)")
    val out = new Array[Double](books.length * ksub)
    var j = 0
    while (j < books.length) {
      val book = books(j)
      val off = j * dsub
      val outOff = j * ksub
      var k = 0
      while (k < ksub) {
        val cw = book(k)
        var dot = 0.0
        var i = 0
        while (i < dsub) { dot += x.getDouble(off + i) * cw(i); i += 1 }
        out(outOff + k) = dot
        k += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any, bs: Any): Any =
    lut(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _) => {
      val self = ctx.addReferenceObj("pqLut", this, classOf[PqLut].getName)
      s"${ev.value} = $self.lut($v);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqLut =
    copy(left = newLeft, right = newRight)
}
