package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DoubleType}

/** Analysis-time input-type contracts for graft's native expressions.
  * `AbstractDataType` is private[sql], so the `inputTypes` override must
  * live inside an org.apache.spark.sql package — expressions outside mix
  * these traits in instead of naming the type. */
trait ArrayDoubleBinaryInputs extends ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
}
