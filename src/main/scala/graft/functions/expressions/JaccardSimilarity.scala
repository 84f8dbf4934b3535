package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Jaccard similarity |A∩B| / |A∪B| of two
  * `array<string>` columns whose elements are DISTINCT (shingle sets —
  * [[graft.text.Dedup.shingles]] emits `array_distinct`ed arrays).
  *
  * Replaces `size(array_intersect(a,b)) / size(array_union(a,b))` on the
  * dedup-verify hot path: the built-in pair walks both arrays twice and
  * materializes two intermediate arrays per row; this builds one hash set
  * and counts — no allocation beyond the set, one pass over each side.
  * For distinct inputs |A∪B| = |A|+|B|−|A∩B|, so union is free.
  */
case class JaccardSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements(); val nb = y.numElements()
    if (na == 0 && nb == 0) return 1.0d
    val set = new java.util.HashSet[UTF8String](na * 2)
    var i = 0
    while (i < na) { set.add(x.getUTF8String(i)); i += 1 }
    var inter = 0
    i = 0
    while (i < nb) { if (set.contains(y.getUTF8String(i))) inter += 1; i += 1 }
    inter.toDouble / (na + nb - inter)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val set = ctx.freshName("set")
      val inter = ctx.freshName("inter")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |if ($na == 0 && $nb == 0) { ${ev.value} = 1.0; } else {
         |  java.util.HashSet<org.apache.spark.unsafe.types.UTF8String> $set =
         |    new java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>($na * 2);
         |  for (int $i = 0; $i < $na; $i++) { $set.add($a.getUTF8String($i)); }
         |  int $inter = 0;
         |  for (int $i = 0; $i < $nb; $i++) {
         |    if ($set.contains($b.getUTF8String($i))) { $inter++; }
         |  }
         |  ${ev.value} = (double) $inter / ($na + $nb - $inter);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSimilarity =
    copy(left = newLeft, right = newRight)
}
