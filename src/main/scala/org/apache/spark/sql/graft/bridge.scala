package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` surface needed to expose custom Catalyst
  * expressions as `Column`s and register them for SQL. Lives in the
  * `org.apache.spark.sql` package tree for access; uses only the published
  * Spark artifact (the same technique every SparkSessionExtensions-based
  * library uses).
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit = {
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
    ()
  }

  /** Apply a SparkSessionExtensions' injected functions to a live session —
    * the same `registerFunctions` call the session builder makes when
    * `spark.sql.extensions` is set (that path is `private[sql]`; tests use
    * this to exercise an extensions payload against an existing session).
    */
  def applyExtensionFunctions(spark: SparkSession,
                              ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.registerFunctions(spark.sessionState.functionRegistry)
    ()
  }
}
