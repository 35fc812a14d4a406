package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-surface registration for the engine's native functions, so
  * `spark.sql` users get them without the Scala DSL:
  *
  *   SELECT exact_percentile(value, array(0.5D, 0.99D)) FROM t GROUP BY g
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    org.apache.spark.sql.graftbridge.FunctionRegistryBridge.register(
      spark, "exact_percentile", exprs => {
        require(exprs.length == 2,
          "exact_percentile(value, array(percentages...))")
        val ps = exprs(1) match {
          case a: org.apache.spark.sql.catalyst.expressions.CreateArray =>
            a.children.map(_.eval(null) match {
              case d: java.lang.Double => d.doubleValue()
              case d: java.math.BigDecimal => d.doubleValue()
              case d: org.apache.spark.sql.types.Decimal => d.toDouble
              case other => other.toString.toDouble
            })
          case other => throw new IllegalArgumentException(
            s"percentages must be an array literal, got $other")
        }
        ExactPercentileAgg(exprs.head, ps.toSeq).toAggregateExpression()
      })
  }
}
