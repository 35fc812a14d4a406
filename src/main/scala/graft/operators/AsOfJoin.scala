package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with
  * `right.ts <= left.ts` per key — the canonical market-data operator
  * (trade vs prevailing quote). Spark has no built-in as-of join; per the
  * preference order this composes existing operators rather than adding a
  * custom physical plan:
  *
  * union both sides tagged → one window pass per key ordered by
  * (ts, rightFirst) carrying `last(value ignoreNulls)` → keep left rows.
  *
  * Scale: ONE shuffle (the window partition by key) regardless of side
  * sizes — strictly better than the naive range-join (quadratic per key)
  * and equivalent to the sort-merge as-of of native engines: within each
  * key the sort is the merge. Ties (equal ts): the right row wins
  * (matches `<=` semantics); duplicate right rows at the same ts resolve
  * to the one latest in `tieCol` order.
  */
object AsOfJoin {

  /** @param left    probe side (keeps all its rows)
    * @param right   reference side, columns: keys ++ (tsCol, valueCols...)
    * @param keys    equi-join keys
    * @param tsCol   ordering column name (present in both sides)
    * @param valueCols right-side columns to carry (as-of values)
    * @param tieCol  deterministic tie-break within equal (key, ts)
    */
  def lastValueAsOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      valueCols: Seq[String],
      tieCol: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val nullOf: (String, DataFrame) => Column = (c, df) =>
      lit(null).cast(df.schema(c).dataType).as(c)

    val taggedRight = right.select(
      (keys.map(col) :+ col(tsCol) :+ lit(1).as("__is_right") :+
        col(tieCol).as("__tie")) ++
        valueCols.map(c => col(c).as(s"__asof_$c")) ++
        leftCols.filterNot(c => keys.contains(c) || c == tsCol)
          .map(c => nullOf(c, left)): _*)
    val taggedLeft = left.select(
      (keys.map(col) :+ col(tsCol) :+ lit(0).as("__is_right") :+
        col(tieCol).as("__tie")) ++
        valueCols.map(c => nullOf(c, right).as(s"__asof_$c")) ++
        leftCols.filterNot(c => keys.contains(c) || c == tsCol).map(col): _*)

    val unioned = taggedRight.unionByName(taggedLeft)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__is_right").desc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = valueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"__asof_$c", last(col(s"__asof_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__is_right") === 0)
      .select(leftCols.map(col) ++ valueCols.map(c => col(s"__asof_$c").as(s"asof_$c")): _*)
  }

  /** Forward as-of join with optional tolerance: for each left row, the
    * EARLIEST right row with `right.ts >= left.ts` per key (pandas
    * `merge_asof(direction='forward')`, DuckDB `ASOF JOIN ON l.ts <=
    * r.ts`). The matched right timestamp is always carried as
    * `asof_<tsCol>`; with `toleranceMs`, matches farther than the
    * tolerance ahead are nulled out (same row count — a left join).
    *
    * Same single-shuffle shape as [[lastValueAsOf]], with the window
    * traversal reversed: ordered by ts DESC (right rows first at equal
    * ts, so `>=` includes equality), carrying `last(ignoreNulls)` — which
    * in descending order is the minimum right ts at-or-after the left
    * row. Duplicate right rows at one (key, ts) resolve to the least in
    * `tieCol` order; pass a right-unique (key, ts) relation when exact
    * cross-engine determinism is required.
    */
  def firstValueAsOfForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      valueCols: Seq[String],
      tieCol: String,
      toleranceMs: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val nullOf: (String, DataFrame) => Column = (c, df) =>
      lit(null).cast(df.schema(c).dataType).as(c)
    val carriedCols = tsCol +: valueCols

    val taggedRight = right.select(
      (keys.map(col) :+ col(tsCol) :+ lit(1).as("__is_right") :+
        col(tieCol).as("__tie")) ++
        carriedCols.map(c => col(c).as(s"__asof_$c")) ++
        leftCols.filterNot(c => keys.contains(c) || c == tsCol)
          .map(c => nullOf(c, left)): _*)
    val taggedLeft = left.select(
      (keys.map(col) :+ col(tsCol) :+ lit(0).as("__is_right") :+
        col(tieCol).as("__tie")) ++
        carriedCols.map(c => nullOf(c, right).as(s"__asof_$c")) ++
        leftCols.filterNot(c => keys.contains(c) || c == tsCol).map(col): _*)

    val unioned = taggedRight.unionByName(taggedLeft)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).desc, col("__is_right").desc, col("__tie").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = carriedCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"__asof_$c", last(col(s"__asof_$c"), ignoreNulls = true).over(w))
    }
    val leftOnly = carried.filter(col("__is_right") === 0)
    val bounded = toleranceMs match {
      case Some(t) =>
        val within = col(s"__asof_$tsCol") - col(tsCol) <= t
        carriedCols.foldLeft(leftOnly) { (df, c) =>
          df.withColumn(s"__asof_$c", when(within, col(s"__asof_$c")))
        }
      case None => leftOnly
    }
    bounded.select(
      leftCols.map(col) ++ carriedCols.map(c => col(s"__asof_$c").as(s"asof_$c")): _*)
  }
}
