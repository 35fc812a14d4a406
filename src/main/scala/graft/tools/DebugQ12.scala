package graft.tools
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.functions.{StableAgg => SA}
object DebugQ12 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("debug-q12", "8")
    val g = Tables.events(spark, "/root/testdata/sf0.1")
      .filter(expr("(ts_ms div 3600000) * 3600000 = 1705521600000") && col("event_type") === "click")
    val r = g.agg(
      count(col("value")).as("n"),
      SA.dsum(col("value")).as("s1"),
      SA.dsum(col("value") * col("value"), 10).as("s2"),
      SA.dstdSamp(col("value")).as("std"),
      sum(col("value").cast("decimal(38,6)")).cast("string").as("s1_str"),
      sum((col("value") * col("value")).cast("decimal(38,10)")).cast("string").as("s2_str")
    ).collect().head
    println(s"n=${r.getLong(0)} s1=${java.lang.Double.toHexString(r.getDouble(1))} " +
      s"s2=${java.lang.Double.toHexString(r.getDouble(2))} std=${java.lang.Double.toHexString(r.getDouble(3))} ${r.getDouble(3)}")
    println(s"s1_str=${r.getString(4)} s2_str=${r.getString(5)}")
    spark.stop()
  }
}
