package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal "latest preceding") join — an operator Spark lacks
  * natively, composed from built-ins the scalable way: tag both inputs,
  * union them on (key, time), and carry the most recent right-side row
  * forward with `last(_, ignoreNulls).over(window)`. ONE shuffle + sort
  * by key (the same cost as any keyed window), no time-range join
  * explosion and no per-key driver loop — this is the formulation that
  * survives a 100 TB event log, unlike a range join whose candidate set
  * grows with key × window density.
  *
  * The reference has no as-of join (SURVEY §2.4: equi joins only); this
  * extends the engine for event-attribution pipelines (purchase → last
  * touchpoint), the training-data analog of point-in-time feature joins.
  */
object AsOf {

  /** For each `left` row, attach the single latest `right` row with
    * `right(rightTime) <= left(leftTime)` for the same `key` (inclusive
    * — a right row at exactly leftTime matches). Left rows with no
    * preceding right row keep null right columns (left-outer semantics).
    *
    * Requirements: `right` must be unique per (key, rightTime) —
    * pre-aggregate ties or the match is nondeterministic; column names
    * must not collide between the two inputs (rename before calling).
    * Right rows with a null time are dropped (they precede nothing);
    * left rows with a null time match nothing.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String): DataFrame = {
    val lCols = left.columns.toSeq
    val rCols = right.columns.toSeq.filterNot(_ == key)
    require(lCols.intersect(rCols).isEmpty,
      s"column collision between sides: ${lCols.intersect(rCols).mkString(",")}")
    // pack each side's payload into one struct so the union is just
    // (key, time, side-tag, l-struct, r-struct) regardless of schema
    val lType = left.select(struct(lCols.map(col): _*).as("s")).schema("s").dataType
    val rType = right.select(struct(rCols.map(col): _*).as("s")).schema("s").dataType
    val l = left.select(
      col(key).as("__k"), col(leftTime).as("__t"), lit(1).as("__seq"),
      struct(lCols.map(col): _*).as("__l"), lit(null).cast(rType).as("__r"))
    // null-key right rows must never match (SQL join semantics — the
    // window would otherwise group them with null-key LEFT rows, which
    // still emit, unmatched, like any outer join)
    val r = right.filter(col(rightTime).isNotNull && col(key).isNotNull).select(
      col(key).as("__k"), col(rightTime).as("__t"), lit(0).as("__seq"),
      lit(null).cast(lType).as("__l"), struct(rCols.map(col): _*).as("__r"))
    // __seq orders a right row BEFORE a left row at the same instant,
    // which is exactly the inclusive (>=) as-of semantics
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__seq") === 1)
      // getField resolves literal names — a dotted column name inside a
      // col("__l.a.b") path string would be parsed as nested access
      .select(lCols.map(c => col("__l").getField(c).as(c)) ++
        rCols.map(c => col("__match").getField(c).as(c)): _*)
  }

  /** q21: last-touch attribution over the events stream — each purchase
    * event attributed to the same user's latest preceding click (clicks
    * deduped per (user, ts) by max event_id so the match is unique). */
  def purchaseLastClick(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts").as("click_ts"))
      .agg(max(col("event_id")).as("click_id"))
    asOfJoin(purchases, clicks, "user_id", "ts", "click_ts")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q21_asof_attribution" -> purchaseLastClick,
  )

  /** DuckDB validates with its native ASOF LEFT JOIN — a fully
    * independent implementation of the same semantics. */
  val oracle: Map[String, String] = Map(
    "q21_asof_attribution" ->
      """WITH p AS (
        |  SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, ts AS click_ts, MAX(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id, p.ts, p.value, c.click_ts, c.click_id
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.ts >= c.click_ts""".stripMargin,
  )
}
