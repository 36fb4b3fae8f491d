package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Backward as-of join — the temporal operator Spark lacks natively (each
 * left row picks up the latest right row with right.ts <= left.ts for
 * the same key; the shape every feature-store / model-version lookup
 * needs). Composed from existing operators (the preferred path before a
 * custom plan node): tag both sides, `unionByName` them, one window pass
 * per key ordered by (ts, side) carrying the latest right snapshot
 * forward, keep left rows. The carry is ONE `last(ignoreNulls)` over a
 * struct of all payload columns built only on right rows — the latest
 * matched right row wins ATOMICALLY, so a right row whose payload
 * columns are legitimately NULL still wins (filling each column
 * independently would let later left rows inherit stale values from an
 * older snapshot, or tear a row across two snapshots).
 *
 * Scale shape: ONE shuffle on the key + an in-partition sort — exactly
 * the sort-merge layout a native as-of join would use; no row explosion,
 * no range cross-product. Right rows at the same key+ts as a left row
 * sort first, so "at or before" includes ties. Right-side (key, ts)
 * pairs should be unique (as in any snapshot/dimension table) — with
 * duplicates the winner among equal timestamps is unspecified.
 */
object AsOf {

  /**
   * @param left     fact rows (kept, one output row each)
   * @param right    snapshot/dimension rows providing `payload` columns
   * @param key      equality key column (both sides)
   * @param leftTs   left timestamp column
   * @param rightTs  right timestamp column
   * @param payload  right columns carried onto each left row (null when
   *                 no right row at or before the left timestamp)
   */
  def joinBackward(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   payload: Seq[String]): DataFrame = {
    val l = left.withColumn("__ts", col(leftTs)).withColumn("__is_l", lit(1))
    val r = right.select((Seq(col(key), col(rightTs).as("__ts")) ++
      payload.map(col)): _*).withColumn("__is_l", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts").asc, col("__is_l").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // non-null exactly on right rows (left rows contribute null), so the
    // single last(ignoreNulls) picks the whole latest snapshot at once
    val snap = when(col("__is_l") === 0, struct(payload.map(col): _*))
    val filled = u.withColumn("__snap", last(snap, ignoreNulls = true).over(w))
    payload.foldLeft(filled.where(col("__is_l") === 1)) { (df, c) =>
      df.withColumn(c, col("__snap").getField(c))
    }.drop("__ts", "__is_l", "__snap")
  }
}
