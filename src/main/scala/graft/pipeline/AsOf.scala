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

  /**
   * Skew-safe variant: identical semantics to `joinBackward`, but the
   * big window partitions by (key, time-bucket) instead of key alone —
   * a pathological hot key (one user = 10⁹ events) spreads across
   * buckets instead of serializing through one window task.
   *
   * Each bucket must still see snapshots from EARLIER buckets, so a
   * small pre-pass computes per-(key, bucket) carry-in rows: the latest
   * right snapshot per (key, bucket) (one aggregation), carried forward
   * along buckets with one per-key window — but that window runs over
   * #distinct-buckets rows per key, not #events, so the hot key's
   * serialized work is ~(time span / bucketSeconds), independent of its
   * event count. Carry rows enter their bucket sorted FIRST (bucket
   * start ts, side tag −1), so any real in-bucket snapshot at the same
   * instant wins, exactly as a newer row should.
   *
   * Cost: two extra small exchanges (per-bucket latest + carry window)
   * versus `joinBackward`'s one — use it when key skew is expected;
   * output is row-identical (pinned by the equality property test).
   */
  def joinBackwardBucketed(left: DataFrame, right: DataFrame, key: String,
                           leftTs: String, rightTs: String,
                           payload: Seq[String],
                           bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    // epoch seconds incl. fraction → bucket ordinal
    def bkt(c: Column): Column = floor(c.cast("double") / bucketSeconds).cast("long")

    val l = left.withColumn("__ts", col(leftTs)).withColumn("__is_l", lit(1))
      .withColumn("__b", bkt(col(leftTs)))
    val r = right.select((Seq(col(key), col(rightTs).as("__ts")) ++
      payload.map(col)): _*).withColumn("__is_l", lit(0))
      .withColumn("__b", bkt(col("__ts")))

    // latest right snapshot per (key, bucket): max over (ts, payload)
    // structs — (key, ts) is unique per the operator contract, so the
    // comparison is decided by __ts alone
    val snapStruct = struct((Seq(col("__ts")) ++ payload.map(col)): _*)
    val perBucket = r.groupBy(col(key), col("__b"))
      .agg(max(snapStruct).as("__latest"))

    // carry-in per (key, bucket), for every bucket either side touches:
    // the latest snapshot from any STRICTLY earlier bucket
    val buckets = l.select(col(key), col("__b"))
      .union(r.select(col(key), col("__b"))).distinct()
    val wCarry = Window.partitionBy(col(key)).orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = buckets.join(perBucket, Seq(key, "__b"), "left")
      .withColumn("__carry", last(col("__latest"), ignoreNulls = true).over(wCarry))
      .where(col("__carry").isNotNull)
      .select(col(key), col("__b"), col("__carry"))
    // carry rows sort at the bucket start; cast to the LEFT ts column's
    // type so the three-way unionByName stays type-compatible when the
    // caller's timestamps are numeric epochs rather than TIMESTAMP
    val bucketStart =
      (col("__b") * bucketSeconds).cast(left.schema(leftTs).dataType)
    val carryRows = payload.foldLeft(
      carries
        .withColumn("__ts", bucketStart)
        .withColumn("__is_l", lit(-1))) { (df, c) =>
      df.withColumn(c, col("__carry").getField(c))
    }.drop("__carry")

    val u = l.unionByName(r, allowMissingColumns = true)
      .unionByName(carryRows, allowMissingColumns = true)
    val w = Window.partitionBy(col(key), col("__b"))
      .orderBy(col("__ts").asc, col("__is_l").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val snap = when(col("__is_l") <= 0, struct(payload.map(col): _*))
    val filled = u.withColumn("__snap", last(snap, ignoreNulls = true).over(w))
    payload.foldLeft(filled.where(col("__is_l") === 1)) { (df, c) =>
      df.withColumn(c, col("__snap").getField(c))
    }.drop("__ts", "__is_l", "__b", "__snap")
  }
}
