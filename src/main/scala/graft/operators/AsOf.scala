package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — a whole operator Spark lacks natively,
  * composed from built-ins the scale-correct way (builder mandate:
  * "compose existing ops if semantics allow" before custom plans):
  *
  *   for each LEFT row: the most recent RIGHT row with the same key and
  *   right.time <= left.time.
  *
  * Implementation: tag both sides, UNION, one window over
  * (key ORDER BY time, side, rightId) carrying `last(right id, ignoreNulls)`
  * forward, keep left rows. Cost = ONE hash shuffle on the key + an
  * in-partition sort — the same shape as any windowed aggregation; NEVER a
  * time-range cross join (the naive `l JOIN r ON key AND r.ts <= l.ts` +
  * max() form explodes quadratically per key at scale).
  *
  * Tie semantics (deterministic, matched by the DuckDB `ASOF JOIN` oracle):
  * a right row at EXACTLY the left timestamp matches (`<=` — right sorts
  * before left at equal time via the side tag); among right rows tied on
  * time the largest id wins. Unmatched left rows are dropped (inner as-of).
  */
object AsOf {

  /** `left`/`right`: DataFrames with columns (`key`, `time`, `id`).
    * Output: (left id AS `leftOut`, matched right id AS `rightOut`). */
  def asofJoin(left: DataFrame, right: DataFrame,
      key: String, time: String, id: String,
      leftOut: String, rightOut: String): DataFrame = {
    val idType = right.schema(id).dataType
    val l = left.select(col(key), col(time), lit(1).as("_side"),
      col(id).as("_lid"), lit(null).cast(idType).as("_rid"))
    val r = right.select(col(key), col(time), lit(0).as("_side"),
      lit(null).cast(left.schema(id).dataType).as("_lid"), col(id).as("_rid"))
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("_side"), col("_rid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionAll(r)
      .withColumn("_matched", last(col("_rid"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1 && col("_matched").isNotNull)
      .select(col("_lid").as(leftOut), col("_matched").as(rightOut))
  }
}
