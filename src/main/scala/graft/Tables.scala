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

  /** `events` with derived clocks: `ts_ms` (epoch ms, exact — equals DuckDB
    * `epoch_ms(ts)`) and `ts_utc` (µs-precision TimestampType, equals
    * DuckDB's read of the same parquet column).
    *
    * Clock derivation is SCHEMA-ADAPTIVE because the harness has shipped the
    * physical `ts` encoding two different ways (TIMESTAMP(NANOS), read as
    * Long ns via `spark.sql.legacy.parquet.nanosAsLong` — see
    * [[GraftSession]] — and, since 2026-08-13, plain `timestamp[us]`, which
    * that legacy conf does not touch and which arrives as TIMESTAMP_NTZ).
    * Downstream queries only ever consume the derived `ts_ms`/`ts_utc`, so
    * adapting here re-derives identical values for every consumer regardless
    * of encoding (property-tested in ClockEncodingSpec). At 100 TB this is
    * exactly where encoding drift belongs: one loader, not N operators.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    import org.apache.spark.sql.types.{LongType, TimestampType, TimestampNTZType}
    raw.schema("ts").dataType match {
      case LongType =>
        // TIMESTAMP(NANOS) fixture read as Long ns: exact integer-space math.
        raw.withColumn("ts_ms", expr("ts div 1000000"))
           .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
      case TimestampType | TimestampNTZType =>
        // timestamp[us]/[ms] fixture: session TZ is UTC, so the NTZ→TS cast
        // is an identity on the underlying micros; unix_micros keeps the math
        // in exact integer space (no double round-trip). Derived columns are
        // appended in the SAME order as the nanos branch (ts_ms, then ts_utc)
        // so the loader's output schema is encoding-invariant.
        raw.withColumn("ts_ms", expr("unix_micros(cast(ts as timestamp)) div 1000"))
           .withColumn("ts_utc", col("ts").cast(TimestampType))
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported physical type $other — expected Long " +
            "(nanos fixture) or Timestamp/TimestampNTZ (micros fixture); " +
            "run graft.TablesSchemaSpec for the full observed schema")
    }
  }
}
