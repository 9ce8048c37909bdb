package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversions (Spark 4's
  * classic ExpressionUtils) for graft's native expressions that carry
  * non-Expression state (e.g. [[graft.functions.SignBandBuckets]]'s
  * primitive plane matrix) and therefore cannot ride the
  * `call_function` registry, whose builders only receive child
  * Expressions built from Columns. Standard technique for Spark
  * extensions; nothing here depends on non-public BEHAVIOR — the two
  * methods are the exact conversions `call_function` itself performs.
  */
object graftbridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
