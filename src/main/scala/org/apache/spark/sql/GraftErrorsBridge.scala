package org.apache.spark.sql

import org.apache.spark.sql.types.Decimal

/** Bridge into `private[sql]` error builders so graft's exact-decimal
  * kernel can throw the SAME errors the built-in cast (NUMERIC_VALUE_OUT_OF_RANGE)
  * and CheckOverflowInSum (ARITHMETIC_OVERFLOW "in sum of decimals") raise
  * under ANSI. Lives in this package solely for access; keep it to these
  * two calls. */
object GraftErrorsBridge {
  def decimalOverflow(value: Decimal, precision: Int, scale: Int): ArithmeticException =
    org.apache.spark.sql.errors.QueryExecutionErrors
      .cannotChangeDecimalPrecisionError(value, precision, scale, null)

  def decimalSumOverflow(): ArithmeticException =
    org.apache.spark.sql.errors.QueryExecutionErrors
      .overflowInSumOfDecimalError(null, "try_sum")
}
