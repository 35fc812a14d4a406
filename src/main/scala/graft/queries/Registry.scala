package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator demonstration: a Spark query over the harness
  * tables plus (when SQL-expressible) a DuckDB oracle that must produce
  * identical rows at sf0.01.
  */
case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

trait Registry {
  def all: Seq[Q]
}
