package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Config-driven transformation rules — the real implementation of the
  * reference's declared-but-stubbed extension point
  * `TransformationRule(name, condition, action)` (transformer.py:257-272).
  *
  * Conditions and actions are SQL expression strings compiled by
  * Catalyst's `expr()` — the rules engine IS the SQL engine, so rules get
  * codegen, pushdown, and the whole function library for free, and a rule
  * set is serializable config (JSON/YAML-able strings), not code.
  */
object Rules {

  sealed trait Rule {
    def name: String
    def apply(df: DataFrame): DataFrame
  }

  /** Keep only rows satisfying `condition`. */
  final case class FilterRule(name: String, condition: String) extends Rule {
    def apply(df: DataFrame): DataFrame = df.filter(expr(condition))
  }

  /** Set/derive `column` = `expression` for every row. */
  final case class ColumnRule(name: String, column: String, expression: String) extends Rule {
    def apply(df: DataFrame): DataFrame = df.withColumn(column, expr(expression))
  }

  /** Conditional update: `column` = `thenExpression` where `condition`
    * holds, else unchanged (column must exist).
    */
  final case class WhenRule(name: String, column: String,
                            condition: String, thenExpression: String) extends Rule {
    def apply(df: DataFrame): DataFrame =
      df.withColumn(column,
        when(expr(condition), expr(thenExpression)).otherwise(col(column)))
  }

  /** Apply rules in declaration order (order is part of the contract —
    * later rules see earlier rules' columns).
    */
  def applyAll(df: DataFrame, rules: Seq[Rule]): DataFrame =
    rules.foldLeft(df)((d, r) => r.apply(d))
}
