package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration of graft's custom Catalyst expressions, so
  * `spark.sql("SELECT simhash64(...)")` works alongside the Column API.
  * Two entry points:
  *  - [[register]] adds them to an existing session's function registry;
  *  - [[GraftExtensions]] injects them at session build time
  *    (`SparkSession.builder().withExtensions(new GraftExtensions)`), the
  *    deployment path for a shared cluster where sessions are created by
  *    the platform.
  */
object GraftFunctions {

  private def intArg(e: Expression): Int =
    e.eval(null) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(s"expected int literal, got $other")
    }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "simhash64" -> (args => HashExprs.SimHash64(args.head)),
    "minhash_signature" -> (args => args match {
      case Seq(c) => HashExprs.MinHashSignature(c, 128)
      case Seq(c, n) => HashExprs.MinHashSignature(c, intArg(n))
      case _ => throw new IllegalArgumentException("minhash_signature(shingles[, numHashes])")
    }),
    "rolling_fingerprints" -> (args => args match {
      case Seq(c) => HashExprs.RollingFingerprints(c, 8, 16)
      case Seq(c, k, w) => HashExprs.RollingFingerprints(c, intArg(k), intArg(w))
      case _ => throw new IllegalArgumentException("rolling_fingerprints(text[, k, w])")
    }))
  // Note: the Column-composition functions (TextFunctions/VectorFunctions)
  // are deliberately NOT SQL-registered — a composed Column converted back
  // to an Expression carries unresolved ColumnNode wrappers that Spark 4's
  // analyzer rejects inside a function builder. Their SQL equivalents are
  // plain built-in expressions (see the oracle SQL in Queries.scala).

  /** Register into a live session (temp functions). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }

  private[functions] def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[HashExprs.type].getName, name)

  /** Builder-time injection for new sessions. */
  class GraftExtensions extends (SparkSessionExtensions => Unit) {
    override def apply(ext: SparkSessionExtensions): Unit =
      all.foreach { case (name, builder) =>
        ext.injectFunction((FunctionIdentifier(name), info(name), builder))
      }
  }
}
