package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.ExtractTextExpr

/** SQL registration for the engine's custom Catalyst expressions, so
  * `spark.sql("SELECT extract_text(html) ...")` works alongside the Column
  * API (SURVEY.md §2 J policy #2: expressions registered via
  * FunctionRegistry).
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("extract_text"),
      new ExpressionInfo(classOf[ExtractTextExpr].getName, "extract_text"),
      (exprs: Seq[Expression]) => ExtractTextExpr(exprs.head))
  }
}
