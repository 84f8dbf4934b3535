package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression: product-quantization encoder. For an
  * `array<double>` vector and a LITERAL `array<array<array<double>>>`
  * codebook table (m subspaces × ksub codewords × dsub dims), returns
  * the `array<int>` of per-subspace argmin-L2 codeword indices — the
  * PQ code word of Jégou et al., "Product Quantization for Nearest
  * Neighbor Search" (TPAMI 2011).
  *
  * Why an Expression (the [[CellArgMax]] rationale): the composed form
  * evaluates m·ksub `aggregate(zip_with(slice(...)))` HOF chains per
  * row — at the (8, 64) defaults that is 512 array allocations per
  * input row on the encode path, which runs over the FULL corpus at
  * index build. Here the whole code word is one zero-allocation loop
  * over the row's doubles (m·ksub·dsub multiply-adds), with per-
  * codeword constants hoisted to expression init and codegen calling
  * one method on the reference object.
  *
  * Distances are squared L2 (no sqrt — monotone, and on integer-grid
  * inputs the accumulation is EXACT in double, which is what the q269/
  * q270 oracle arithmetic leans on). Ties break to the SMALLER codeword
  * index (strict `<` update) — mirrored in the oracle's
  * `ORDER BY dist, code`. NaN coordinates: a NaN distance never wins
  * under `<`, so the result is the first codeword with a non-NaN
  * distance (or code 0 if all are NaN) — unreachable through graft's
  * entry points (requireDim'd finite embeddings), documented not
  * special-cased. Vector length must equal m·dsub — enforced per row
  * (one int compare), the [[CellArgMax]] fail-fast rule.
  */
case class PqEncode(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(ArrayType(DoubleType), ArrayType(ArrayType(ArrayType(DoubleType))))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  @transient private lazy val books: Array[Array[Array[Double]]] = {
    require(right.foldable, "pq_encode codebooks must be a literal")
    val ad = right.eval(null).asInstanceOf[ArrayData]
    val bs = Array.tabulate(ad.numElements()) { j =>
      val sub = ad.getArray(j)
      Array.tabulate(sub.numElements())(k => sub.getArray(k).toDoubleArray())
    }
    require(bs.nonEmpty && bs.forall(_.nonEmpty),
      "pq_encode codebooks must have >=1 subspace and >=1 codeword each")
    val dsub = bs(0)(0).length
    require(dsub > 0 && bs.forall(_.forall(_.length == dsub)),
      "pq_encode codewords must be non-empty and equal-length")
    bs
  }
  @transient private lazy val dsub: Int = books(0)(0).length
  @transient private lazy val dim: Int = books.length * dsub

  /** Shared by eval and the codegen'd twin. */
  def encode(x: ArrayData): ArrayData = {
    val n = x.numElements()
    if (n != dim)
      throw new IllegalArgumentException(
        s"pq_encode: vector has $n elements, codebooks cover $dim " +
          s"(${books.length} x $dsub)")
    val codes = new Array[Int](books.length)
    var j = 0
    while (j < books.length) {
      val book = books(j)
      val off = j * dsub
      var best = Double.PositiveInfinity
      var bestK = 0
      var k = 0
      while (k < book.length) {
        val cw = book(k)
        var dist = 0.0
        var i = 0
        while (i < dsub) {
          val d = x.getDouble(off + i) - cw(i)
          dist += d * d
          i += 1
        }
        if (dist < best) { best = dist; bestK = k }
        k += 1
      }
      codes(j) = bestK
      j += 1
    }
    new GenericArrayData(codes)
  }

  override def nullSafeEval(v: Any, bs: Any): Any =
    encode(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _) => {
      val self = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
      s"${ev.value} = $self.encode($v);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)
}
