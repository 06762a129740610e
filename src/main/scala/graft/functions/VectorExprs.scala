package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for cosine similarity over embedding
  * columns.
  *
  * Why not the `zip_with`/`aggregate` composition ([[VectorFunctions]]
  * keeps it for reference): Spark's higher-order functions are
  * interpreted (CodegenFallback) — every row pays lambda dispatch and a
  * materialized intermediate array per operation, and the surrounding
  * stage falls out of whole-stage codegen. This expression reads the two
  * `ArrayData` buffers in ONE fused loop with no allocation, and
  * `doGenCode` emits a static kernel call so the stage stays fused —
  * the difference is a large constant factor on the similarity family
  * (brute-force top-k scoring, LSH verification, semantic dedup), which
  * is corpus x queries sized at 100 TB.
  *
  * The accumulation order (strict left-to-right, double) is identical to
  * the higher-order formulation, so results are bit-equal — asserted in
  * SimilarityOpsSpec.
  */
object VectorExprs {

  /** Shared kernel (interpreted eval and codegen call the same code).
    * Accumulates dot and both squared norms in one pass; cosine is 0
    * when either norm is 0 (same guard as the composed version).
    */
  def cosineKernel(a: ArrayData, b: ArrayData, floatA: Boolean, floatB: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (floatA) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (floatB) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val nn = math.sqrt(na) * math.sqrt(nb)
    if (nn > 0) dot / nn else 0.0
  }

  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"cosine_similarity needs array<float|double> inputs, " +
          s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

    private def isFloat(e: Expression): Boolean =
      e.dataType.asInstanceOf[ArrayType].elementType == FloatType

    override protected def nullSafeEval(a: Any, b: Any): Any =
      cosineKernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
        isFloat(left), isFloat(right))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (c1, c2) =>
        s"${ev.value} = graft.functions.VectorExprs.cosineKernel(" +
          s"$c1, $c2, ${isFloat(left)}, ${isFloat(right)});")

    override def prettyName: String = "cosine_similarity"
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }
}
