package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `graft_dot(a, b)`: sequential-fold dot product of two double arrays as a
  * native codegen'd expression.
  *
  * Why not `aggregate(zip_with(a, b, _*_), 0d, _+_)`: Spark evaluates
  * higher-order-function lambdas INTERPRETED (never codegen'd), which made
  * the brute-force cosine join 10x slower than necessary (measured 20s ->
  * 2s at sf0.1 for dedup_embedding_cosine). The generated loop below stays
  * inside whole-stage codegen.
  *
  * Semantics match the HOF version exactly: left-to-right double
  * accumulation — the same order DuckDB's
  * list_sum(list_transform(range(..), i -> a[i]*b[i])) uses, so oracle
  * float parity is bit-exact. ImplicitCastInputTypes lifts array<float>
  * inputs to array<double> before the fold (multiplying in float32 would
  * diverge). NULL semantics mirror the HOF form exactly, so
  * RewriteHofDotProduct is value-preserving on every input:
  *   - mismatched lengths -> NULL (zip_with null-pads the shorter side and
  *     null poisons the fold);
  *   - any NULL element on either side -> NULL (the pairwise product is
  *     NULL and acc + NULL stays NULL for the rest of the fold).
  */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int graftDotN = $a.numElements();
         |  double graftDotS = 0.0;
         |  for (int graftDotI = 0; graftDotI < graftDotN; graftDotI++) {
         |    if ($a.isNullAt(graftDotI) || $b.isNullAt(graftDotI)) {
         |      ${ev.isNull} = true;
         |      break;
         |    }
         |    graftDotS += $a.getDouble(graftDotI) * $b.getDouble(graftDotI);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = graftDotS;
         |  }
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
