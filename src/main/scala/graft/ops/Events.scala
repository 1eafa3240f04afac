package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Relational.{t, events, r2}

/** Event analytics over the `events` table — the batch/event-time
  * re-grounding of the reference's processing-time features
  * (`group(interval=)`, SURVEY §2.8). Streaming equivalents live in
  * [[graft.streaming.Streams]].
  */
object Events {

  /** Tumbling-window aggregation (event-time): the principled analog
    * of `group(interval=)` — hourly buckets per event_type. */
  def hourlyStats(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("hour", date_format(date_trunc("hour", col("ts")),
        "yyyy-MM-dd HH:mm"))
      .groupBy("hour", "event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("hour", "event_type")

  /** Gap-based sessionization (30-min inactivity): lag per user →
    * session boundaries → running session ids — key-partitioned
    * windows only, scales with user cardinality. */
  def sessionize(s: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    // millisecond precision on both sides (the DuckDB oracle uses
    // epoch_ms) — second-truncation would disagree on ~30:00.x gaps
    val gapMs = gapMinutes * 60000L
    events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_millis(col("ts")) - unix_millis(col("prev_ts")) > gapMs, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-user session stats from [[sessionize]]. */
  def sessionStats(s: SparkSession, dir: String): DataFrame =
    sessionize(s, dir)
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"))
      .groupBy("user_id")
      .agg(max("session_id").as("n_sessions"),
        r2(sum("n_events") / count(lit(1))).as("avg_events_per_session"),
        max("n_events").as("max_session_events"))
      .orderBy("user_id")

  /** As-of join realized as the shuffle-parallel "union + carry-forward
    * window" pattern: attribute each purchase to the user's most recent
    * strictly-prior click. One shuffle on user_id, no range/theta join,
    * no per-row probe — the scalable formulation of `ASOF JOIN` (at
    * 100 TB both event streams shuffle once on the key and each
    * partition is a single ordered sweep). Strictly-prior = rows
    * (unboundedPreceding, -1) in (ts, event_id) order, so a click and
    * purchase sharing a timestamp resolve deterministically. */
  def purchaseAttribution(s: SparkSession, dir: String): DataFrame = {
    val byUserPrior = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ev = events(s, dir)
      .withColumn("click_tms",
        last(when(col("event_type") === "click", unix_millis(col("ts"))),
          ignoreNulls = true).over(byUserPrior))
      .withColumn("click_id",
        last(when(col("event_type") === "click", col("event_id")),
          ignoreNulls = true).over(byUserPrior))
    ev.filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_purchases"),
        count(col("click_id")).as("n_attributed"),
        r2(sum((unix_millis(col("ts")) - col("click_tms")) / 1000.0) /
          count(col("click_id"))).as("avg_lag_sec"))
      .orderBy("user_id")
  }

  /** Top-10 users by total event value (deterministic tiebreak). */
  def topUsers(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy("user_id")
      .agg(round(sum("value"), 2).as("total_value"), count(lit(1)).as("n"))
      .orderBy(col("total_value").desc, col("user_id"))
      .limit(10)
}
