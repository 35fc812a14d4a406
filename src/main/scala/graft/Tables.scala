package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the harness parquet tables (TESTDATA.md).
  *
  * Column pruning + predicate pushdown happen automatically because these
  * return plain scans; callers `.select`/`.filter` and Catalyst pushes both
  * into the parquet reader (check `PushedFilters`/`ReadSchema` in
  * `.explain("formatted")`).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Adaptive fan-out for CPU-bound per-row pipelines: parquet scans can't
    * split below row-group granularity, and the harness fixtures are
    * single-row-group files — without this, a 32-core session runs the
    * whole map side on one task. When the scan already has enough splits
    * (any real multi-file/multi-row-group dataset at scale) this is a
    * no-op, so it never introduces a shuffle where the source parallelism
    * is adequate.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    // Estimate the scan's split count WITHOUT converting the plan to an
    // RDD on the driver (the old `df.rdd.getNumPartitions` forced full
    // physical planning per call): splits ≈ max(file count,
    // bytes / maxPartitionBytes) — parquet can't split below row-group
    // granularity, so file count lower-bounds, and byte-based splitting
    // upper-bounds exactly the way FilePartition packing does. Any real
    // multi-file/multi-row-group dataset at scale clears `target` and
    // this stays a no-op.
    val maxPartBytes = spark.sessionState.conf.filesMaxPartitionBytes
    val sizeBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val estSplits = math.max(df.inputFiles.length.toLong,
      (sizeBytes / BigInt(math.max(1L, maxPartBytes))).toLong)
    if (estSplits < target) df.repartition(target) else df
  }

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** `events` with the TIMESTAMP(NANOS) `ts` (read as Long ns — see
    * [[GraftSession]]) plus derived clocks: `ts_ms` (epoch ms, exact — equals
    * DuckDB `epoch_ms(ts)`) and `ts_utc` (µs-truncated TimestampType, equals
    * DuckDB's µs truncation of the same parquet column).
    */
  def events(s: SparkSession, d: String): DataFrame =
    load(s, d, "events")
      .withColumn("ts_ms", expr("ts div 1000000"))
      .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
}
