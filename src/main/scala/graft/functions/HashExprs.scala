package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the text-fingerprinting operators the
  * reference engine lacks entirely (SURVEY.md §2 "Scalar functions: none").
  *
  * These are native `Expression`s rather than Scala UDFs: no serialization
  * boundary, they operate directly on `UTF8String`/`ArrayData`, and they
  * participate in whole-stage codegen — `doGenCode` emits a static call
  * into the shared eval kernel, so the surrounding stage stays fused (no
  * CodegenFallback interpreted-projection detour). All hashing is Spark's
  * own XXH64, so results are deterministic across JVMs/executors — a
  * requirement for dedup at 100 TB where signatures computed on different
  * nodes must agree.
  */
object HashExprs {

  private val Seed1 = 0x9747b28c0a3dL
  private val Seed2 = 0x7fb5d329e1f3L

  // --- shared eval kernels (called from both interpreted eval and codegen)

  def minhashKernel(arr: ArrayData, numHashes: Int): ArrayData = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h1 = XXH64.hashUTF8String(s, Seed1)
      val h2 = XXH64.hashUTF8String(s, Seed2) | 1L
      var k = 0
      var hk = h1
      while (k < numHashes) {
        if (hk < sig(k)) sig(k) = hk
        hk += h2
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  def simhashKernel(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h = XXH64.hashUTF8String(arr.getUTF8String(i), Seed1)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def rollingKernel(str: UTF8String, k: Int, w: Int): ArrayData = {
    val B = 1000003L
    var bk = 1L
    var x = 0
    while (x < k) { bk *= B; x += 1 }
    val s = str.getBytes
    if (s.length <= k) {
      var h = 0L
      var i = 0
      while (i < s.length) { h = h * B + (s(i) & 0xffL); i += 1 }
      return new GenericArrayData(Array(h))
    }
    val hashes = new Array[Long](s.length - k + 1)
    var h = 0L
    var i = 0
    while (i < k) { h = h * B + (s(i) & 0xffL); i += 1 }
    hashes(0) = h
    while (i < s.length) {
      h = h * B + (s(i) & 0xffL) - bk * (s(i - k) & 0xffL)
      hashes(i - k + 1) = h
      i += 1
    }
    // true winnowing: minimum of EVERY sliding w-window (monotonic deque,
    // O(n)) — alignment-independent, so any shared substring of length
    // >= k+w-1 contributes a shared fingerprint
    val mins = scala.collection.mutable.SortedSet.empty[Long]
    val deque = new java.util.ArrayDeque[Int]()
    var j = 0
    while (j < hashes.length) {
      while (!deque.isEmpty && hashes(deque.peekLast()) >= hashes(j)) deque.pollLast()
      deque.addLast(j)
      if (deque.peekFirst() <= j - w) deque.pollFirst()
      if (j >= w - 1 || j == hashes.length - 1) mins += hashes(deque.peekFirst())
      j += 1
    }
    new GenericArrayData(mins.toArray)
  }

  def tokenGramKernel(arr: ArrayData, n: Int): ArrayData = {
    val cnt = arr.numElements()
    if (cnt < n) return new GenericArrayData(Array.empty[Long])
    val th = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      th(i) = XXH64.hashUTF8String(arr.getUTF8String(i), Seed1)
      i += 1
    }
    val B = 1000003L
    var bn = 1L
    var x = 0
    while (x < n - 1) { bn *= B; x += 1 } // B^(n-1)
    val out = new Array[Long](cnt - n + 1)
    var h = 0L
    i = 0
    while (i < n) { h = h * B + th(i); i += 1 }
    out(0) = h
    while (i < cnt) {
      h = (h - th(i - n) * bn) * B + th(i)
      out(i - n + 1) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  private val kernelCls = "graft.functions.HashExprs"

  /** MinHash signature of a set of shingles (array<string> -> array<long>).
    *
    * k-th hash family member is h1 + k*h2 (Kirsch-Mitzenmacher double
    * hashing over XXH64), signature[k] = min over shingles. Empty input
    * yields Long.MaxValue sentinels so empty docs never collide with
    * non-empty ones in LSH banding.
    */
  case class MinHashSignature(child: Expression, numHashes: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(input: Any): Any =
      minhashKernel(input.asInstanceOf[ArrayData], numHashes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = $kernelCls.minhashKernel($c, $numHashes);")
    override def prettyName: String = "minhash_signature"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** 64-bit SimHash of a set of shingles (array<string> -> long).
    *
    * Classic Charikar simhash: per-bit vote sum over XXH64(shingle),
    * sign of the vote becomes the bit. Near-identical shingle sets give
    * near-identical fingerprints (small Hamming distance).
    */
  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(simhashKernel(input.asInstanceOf[ArrayData]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernelCls.simhashKernel($c);")
    override def prettyName: String = "simhash64"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Winnowed rolling-hash fingerprints of a document (string -> array<long>).
    *
    * Rabin-Karp rolling hash over the UTF-8 bytes with window `k`, then
    * winnowing (Schleimer et al., "Winnowing: Local Algorithms for Document
    * Fingerprinting", SIGMOD'03): the minimum hash of each `w`-window of
    * consecutive rolling hashes, deduplicated and sorted. Output size is
    * ~2n/w, independent of executor — safe to groupBy/join on at scale.
    */
  case class RollingFingerprints(child: Expression, k: Int, w: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(input: Any): Any =
      rollingKernel(input.asInstanceOf[UTF8String], k, w)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = $kernelCls.rollingKernel($c, $k, $w);")
    override def prettyName: String = "rolling_fingerprints"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Positional token n-gram hashes (array<string> -> array<long>, one
    * hash per gram start position, order preserved).
    *
    * Each token is XXH64'd ONCE, then consecutive n-tuples combine with
    * a rolling polynomial — O(tokens) total where hashing each gram
    * slice is O(tokens × n) plus n-1 array allocations per position.
    * This is the throughput key family for span-level dedup
    * (Dedup.duplicateSpans); a collision can only ever ADD a candidate
    * position there, never lose one.
    */
  case class TokenGramHashes(child: Expression, n: Int)
      extends UnaryExpression {
    // constructed during analysis (incl. the token_gram_hashes SQL
    // registry), so this rejects n <= 0 as an analysis-time error instead
    // of cnt+1 garbage hashes (n = 0) or an AIOOBE from inside codegen
    require(n >= 1, s"token_gram_hashes needs n >= 1, got $n")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(input: Any): Any =
      tokenGramKernel(input.asInstanceOf[ArrayData], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = $kernelCls.tokenGramKernel($c, $n);")
    override def prettyName: String = "token_gram_hashes"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  // --- Column-API wrappers -------------------------------------------------

  def minhashSignature(shingles: Column, numHashes: Int): Column =
    GraftBridge.column(MinHashSignature(GraftBridge.expression(shingles), numHashes))

  def simhash64(shingles: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(shingles)))

  def rollingFingerprints(text: Column, k: Int = 8, w: Int = 16): Column =
    GraftBridge.column(RollingFingerprints(GraftBridge.expression(text), k, w))

  def tokenGramHashes(tokens: Column, n: Int): Column =
    GraftBridge.column(TokenGramHashes(GraftBridge.expression(tokens), n))
}
