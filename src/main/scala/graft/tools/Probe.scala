package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch probe (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.printSchema()
    ev.select(col("event_id"), col("ts"),
        (col("ts") / 1000000L).cast("long").as("ms_div"),
        expr("ts div 1000000").as("ms_intdiv"),
        timestamp_micros(expr("ts div 1000")).as("ts_us"))
      .orderBy("event_id").limit(3).show(false)
    val e2 = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    e2.printSchema()
    spark.stop()
  }
}
