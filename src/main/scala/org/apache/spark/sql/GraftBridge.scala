package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DoubleType, FloatType, IntegerType, LongType, TypeCollection}

/** Minimal bridge to Spark's package-private Expression<->Column
  * conversions (org.apache.spark.sql.classic.ExpressionUtils), needed to
  * expose graft's custom Catalyst expressions through the public Column
  * API on Spark 4's unified Column. Lives in org.apache.spark.sql only to
  * satisfy the private[sql] access modifiers; contains no logic.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** `TypeCollection` is private[sql]; this is the accepted-input set for
    * graft's vector expressions (ImplicitCastInputTypes): the four native
    * element kinds pass through UNCHANGED (no cast on the hot path); any
    * other numeric array — notably array<decimal>, which SQL literals
    * like `array(1.0, 0.0)` parse to — implicitly casts to the first
    * member, array<double>.
    */
  val vectorInputTypes: AbstractDataType = TypeCollection(
    ArrayType(DoubleType), ArrayType(FloatType),
    ArrayType(IntegerType), ArrayType(LongType))
}
