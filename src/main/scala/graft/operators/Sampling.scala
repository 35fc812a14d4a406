package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data curation.
  *
  * Real pipelines downsample over-represented strata (languages, sources,
  * event classes) before training. Doing it with `rand()` is
  * irreproducible and breaks exactly-once semantics on retry; the standard
  * scale answer is HASH sampling — a salted digest of a stable row key
  * scaled to [0,1) and compared against the stratum's keep-rate. Pure
  * per-row column arithmetic: no shuffle, no state, identical decisions on
  * every engine/partitioning/retry, and changing the salt yields a fresh
  * independent sample.
  */
object Sampling {

  /** Deterministic uniform in [0,1): first 32 bits of md5(salt:key),
    * decoded arithmetically (see [[Dedup.hexHash32]]), scaled by 2^-32.
    * Exactly reproducible in any engine with md5 + integer ops.
    */
  def uniform(key: Column, salt: String): Column =
    Dedup.hexHash32(md5(concat(lit(s"$salt:"), key.cast("string"))))
      .cast("double") / 4294967296.0d

  /** Hash-stratified sampling: keep a row iff uniform(key) < rate(stratum).
    * `rates` maps stratum values to keep-rates; unlisted strata keep
    * `defaultRate`. The kept row carries its `sample_u` draw for
    * auditability.
    */
  def stratified(df: DataFrame, key: Column, stratum: Column,
      rates: Seq[(String, Double)], defaultRate: Double, salt: String): DataFrame = {
    val rate = rates.foldRight(lit(defaultRate): Column) {
      case ((s, r), acc) => when(stratum === s, lit(r)).otherwise(acc)
    }
    df.withColumn("sample_u", uniform(key, salt))
      .filter(col("sample_u") < rate)
  }
}
