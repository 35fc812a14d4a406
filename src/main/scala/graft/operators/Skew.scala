package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed and
  * where AQE's runtime skew splitting isn't available (e.g. bucketed
  * inputs, or sinks requiring a fixed partitioning): classic salting.
  *
  * The build (small/replicable) side is exploded `saltFactor`× with a
  * salt column; the probe side tags each row with a deterministic salt
  * from a secondary column, spreading one hot key over `saltFactor`
  * reducers. Correctness is unchanged — every probe row still meets its
  * key's build rows exactly once (on its salt replica).
  */
object Skew {
  def saltedJoin(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      saltFactor: Int,
      probeSaltSource: Column): DataFrame = {
    val salted = probe.withColumn("__salt",
      pmod(hash(probeSaltSource), lit(saltFactor)))
    val replicated = build
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
