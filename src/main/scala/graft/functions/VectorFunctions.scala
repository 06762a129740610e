package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, written with
  * higher-order functions (`zip_with`/`aggregate`) so Catalyst codegens the
  * inner loop — no UDF serialization per row.
  *
  * All accumulation is in double with strict left-to-right order, which
  * makes results reproducible run-to-run and engine-to-engine (the oracle
  * computes the same fold).
  */
object VectorFunctions {

  /** Left-to-right double dot product of two float arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn > 0, d / nn).otherwise(lit(0.0))
  }

  /** Sign-LSH bucket id: `bits` hyperplane-sign bits packed into a long.
    * Hyperplane components are pseudo-random in [-1,1), derived from
    * xxhash64 so every executor derives identical planes — no broadcast
    * of random state needed at cluster scale.
    */
  def signLshBucket(vec: Column, bits: Int): Column = {
    val bitCols = (0 until bits).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, j) =>
          x.cast("double") *
            ((pmod(xxhash64(lit(p), j), lit(2001L)).cast("double") - 1000.0) / 1000.0)),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }
}
