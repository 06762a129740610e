package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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

  /** Hyperplane components are a pure function of (plane, dim index):
    * pmod(xxhash64(p, j), 2001)/1000 - 1 in [-1, 1) — exactly the
    * derivation of VectorFunctions.hyperplaneProjection, so executors
    * (and this cache) agree with no coordinated state. Materialized once
    * per (planes, dim) per JVM instead of re-hashed per row.
    */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def planeMatrix(nPlanes: Int, dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((nPlanes, dim), _ =>
      Array.tabulate(nPlanes)(p => Array.tabulate(dim)(j =>
        (Math.floorMod(XXH64.hashInt(j, XXH64.hashInt(p, 42L)), 2001L) - 1000L) / 1000.0)))

  /** Banded sign-LSH kernel: all `bands` bucket ids in one pass over the
    * vector (dense mat-vec against the cached plane matrix + sign
    * packing) — replaces bands*bitsPerBand interpreted zip_with/aggregate
    * evaluations per row.
    */
  def signLshKernel(v: ArrayData, isFloat: Boolean, bands: Int, bits: Int): ArrayData = {
    val dim = v.numElements()
    val planes = planeMatrix(bands * bits, dim)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var bucket = 0L
      var i = 0
      while (i < bits) {
        val row = planes(b * bits + i)
        var acc = 0.0
        var j = 0
        while (j < dim) {
          val x = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
          acc += x * row(j)
          j += 1
        }
        if (acc >= 0) bucket += (1L << i)
        i += 1
      }
      out(b) = bucket
      b += 1
    }
    new GenericArrayData(out)
  }

  case class SignLshBands(child: Expression, bands: Int, bitsPerBand: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sign_lsh_bands needs an array<float|double> input, got ${other.simpleString}")
    }

    private def isFloat: Boolean =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType

    override protected def nullSafeEval(input: Any): Any =
      signLshKernel(input.asInstanceOf[ArrayData], isFloat, bands, bitsPerBand)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.VectorExprs.signLshKernel(" +
          s"$c, $isFloat, $bands, $bitsPerBand);")

    override def prettyName: String = "sign_lsh_bands"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Nearest-cells kernel: dot the vector against every (unit) centroid
    * in one fused pass, then emit the `nprobe` cell ids ordered by
    * (dot desc, cell asc) — the same order as sorting
    * struct(-dot, cell) ascending, so results are bit-identical to the
    * composed formulation. Selection is an O(nlist * nprobe) insertion
    * (both are small constants).
    */
  def nearestCellsKernel(
      v: ArrayData, isFloat: Boolean,
      cents: Array[Array[Double]], nprobe: Int): ArrayData = {
    val dim = v.numElements()
    val n = cents.length
    val dots = new Array[Double](n)
    var c = 0
    while (c < n) {
      val row = cents(c)
      val m = math.min(dim, row.length)
      var acc = 0.0
      var j = 0
      while (j < m) {
        val x = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
        acc += x * row(j)
        j += 1
      }
      dots(c) = acc
      c += 1
    }
    val k = math.min(nprobe, n)
    val best = new Array[Int](k)
    var filled = 0
    c = 0
    while (c < n) {
      // insertion position among current best by (dot desc, cell asc);
      // cells are scanned in ascending order so equal dots keep cell asc
      var pos = filled
      while (pos > 0 && dots(best(pos - 1)) < dots(c)) pos -= 1
      if (pos < k) {
        val upto = math.min(filled, k - 1)
        var m = upto
        while (m > pos) { best(m) = best(m - 1); m -= 1 }
        best(pos) = c
        if (filled < k) filled += 1
      }
      c += 1
    }
    new GenericArrayData(best.take(filled))
  }

  case class NearestCells(child: Expression, cents: Array[Array[Double]], nprobe: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullIntolerant: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"nearest_cells needs an array<float|double> input, got ${other.simpleString}")
    }

    private def isFloat: Boolean =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType

    override protected def nullSafeEval(input: Any): Any =
      nearestCellsKernel(input.asInstanceOf[ArrayData], isFloat, cents, nprobe)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      // the centroid matrix rides along as a codegen object reference
      val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.VectorExprs.nearestCellsKernel(" +
          s"$c, $isFloat, $centsRef, $nprobe);")
    }

    override def prettyName: String = "nearest_cells"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }
}
