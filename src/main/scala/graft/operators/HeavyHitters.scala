package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed heavy hitters: exact top-k most frequent items computed
  * WITHOUT a full-cardinality groupBy shuffle — the vocabulary-pruning /
  * stopword-mining primitive of a training-data pipeline at 100 TB scale.
  *
  * Two phases:
  *  1. Candidate generation: a Misra-Gries summary per partition
  *     (capacity c — classic streaming frequent-items, public algorithm).
  *     Any item with global frequency > N/(c+1) survives in at least one
  *     partition's summary (its local frequency must exceed n_p/(c+1)
  *     somewhere), so with c sized against the expected head the true
  *     top-k is always contained in the ≤ partitions·c candidates.
  *  2. Exact recount of candidates only: broadcast the candidate set,
  *     semi-join the item stream against it map-side (the shuffle ships
  *     only candidate rows, bounded by partitions·c — never the full
  *     item cardinality), then one small aggregation + deterministic
  *     top-k (count desc, item asc).
  *
  * The final result is exactly the true top-k whenever the containment
  * guarantee holds — the per-partition summaries are approximate, the
  * output is not. A full-shuffle groupBy over, say, web-scale token
  * cardinality (10^9+ distinct) would shuffle the whole vocabulary;
  * this shuffles ≤ partitions·c candidate matches.
  */
object HeavyHitters {

  /** Per-partition Misra-Gries candidate items (capacity-bounded). */
  private[operators] def misraGries(it: Iterator[String], capacity: Int): Iterator[String] = {
    val counts = new scala.collection.mutable.HashMap[String, Long]()
    it.foreach { x =>
      counts.get(x) match {
        case Some(n) => counts.update(x, n + 1)
        case None if counts.size < capacity => counts.update(x, 1L)
        case None =>
          // decrement step: all counters drop by 1; zeros evicted
          val dead = List.newBuilder[String]
          counts.foreach { case (k, v) =>
            if (v == 1L) dead += k else counts.update(k, v - 1)
          }
          dead.result().foreach(counts.remove)
      }
    }
    counts.keysIterator
  }

  /** Exact top-k of `itemCol` by frequency (ties → lexicographically
    * smallest item), via MG candidates + broadcast recount.
    */
  def topKExact(items: DataFrame, itemCol: String, k: Int,
      capacity: Int = 4096): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val stream: Dataset[String] = items.select(col(itemCol).cast("string")).as[String]
    val candidates = stream
      .mapPartitions(it => misraGries(it, capacity))
      .distinct()
      .toDF("item")
    stream.toDF("item")
      .join(broadcast(candidates), "item")
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("item").asc)
      .limit(k)
  }
}
