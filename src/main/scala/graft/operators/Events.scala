package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-stream operators over the `events` table (event_id, ts, user_id,
 * event_type, value, props) — the batch twins of the streaming layer:
 * gap-based sessionization and tumbling-window aggregation.
 *
 * Scale notes: sessionization shuffles once on user_id (the same
 * partitioning a streaming flatMapGroupsWithState would use); tumbling
 * aggregation is a partial-agg shuffle on (bucket, event_type). Time
 * arithmetic is in microseconds (unix_micros/epoch_us) so both engines
 * compare integers, never lossy casts.
 */
object Events {

  val SessionGapMicros: Long = 30L * 60 * 1000000 // 30 min

  /** Full sessionized frame: every event column + session_id. The window
    * carries ts/value straight through, so downstream session rollups
    * never re-join the events scan (one user_id shuffle total). */
  private def sessionized(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Inputs.events(spark, dir)
      .withColumn("us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
      .withColumn("new_session",
        when(col("gap").isNull || col("gap") > SessionGapMicros, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Gap-based sessionization: a gap > 30 min starts a new session;
    * session ids are per-user ordinals under (ts, event_id) order. */
  def sessionize(spark: SparkSession, dir: String): DataFrame =
    sessionized(spark, dir).select("user_id", "event_id", "session_id")

  val sessionizeOracle: String =
    s"""WITH g AS (
       |  SELECT user_id, event_id, ts, epoch_us(ts) -
       |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
       |  FROM events
       |), f AS (
       |  SELECT user_id, event_id, ts,
       |    CASE WHEN gap IS NULL OR gap > $SessionGapMicros THEN 1 ELSE 0 END AS new_session
       |  FROM g
       |)
       |SELECT user_id, event_id,
       |  CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       |FROM f""".stripMargin

  /** Session-level rollup: length, span, event count per session —
    * aggregates the sessionized frame directly (the group keys are a
    * prefix of the window partitioning, so no second shuffle). */
  def sessionStats(spark: SparkSession, dir: String): DataFrame =
    sessionized(spark, dir)
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        (max(col("us")) - min(col("us"))).as("span_us"),
        round(sum("value"), 6).as("sum_value"))

  val sessionStatsOracle: String =
    s"""WITH g AS (
       |  SELECT user_id, event_id, ts, value, epoch_us(ts) -
       |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
       |  FROM events
       |), f AS (
       |  SELECT *, CASE WHEN gap IS NULL OR gap > $SessionGapMicros THEN 1 ELSE 0 END AS new_session
       |  FROM g
       |), sess AS (
       |  SELECT user_id, event_id, ts, value,
       |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
       |  FROM f
       |)
       |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       |  count(*) AS n_events,
       |  max(epoch_us(ts)) - min(epoch_us(ts)) AS span_us,
       |  round(sum(value), 6) AS sum_value
       |FROM sess GROUP BY user_id, session_id""".stripMargin

  /** Native session-window rollup (Spark's `session_window`, the
    * streaming-ready form of [[sessionize]]): session end = last event
    * + gap, and a gap of EXACTLY 30 min starts a new session (Spark
    * merges only events strictly inside the horizon — the oracle
    * mirrors that with `gap >= 30min ⇒ new`; the ordinal-id
    * [[sessionize]] keeps the reference's `gap > 30min` convention). */
  def sessionWindow(spark: SparkSession, dir: String): DataFrame =
    Inputs.events(spark, dir)
      .withColumn("tts", col("ts").cast("timestamp"))
      .groupBy(col("user_id"), session_window(col("tts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 6).as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("w.start")).as("session_start_us"),
        unix_micros(col("w.end")).as("session_end_us"),
        col("n_events"), col("sum_value"))

  val sessionWindowOracle: String =
    s"""WITH g AS (
       |  SELECT user_id, event_id, ts, value, epoch_us(ts) -
       |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
       |  FROM events
       |), f AS (
       |  SELECT *, CASE WHEN gap IS NULL OR gap >= $SessionGapMicros THEN 1 ELSE 0 END AS new_s
       |  FROM g
       |), sess AS (
       |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       |  FROM f
       |)
       |SELECT user_id,
       |  min(epoch_us(ts)) AS session_start_us,
       |  max(epoch_us(ts)) + $SessionGapMicros AS session_end_us,
       |  count(*) AS n_events, round(sum(value), 6) AS sum_value
       |FROM sess GROUP BY user_id, sid""".stripMargin

  /** Sliding 1-hour / 15-minute windows per event_type (each event lands
    * in exactly 4 overlapping windows). */
  def sliding(spark: SparkSession, dir: String): DataFrame =
    Inputs.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 6).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  val slidingOracle: String =
    """SELECT
      |  CAST(epoch(time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes') AS BIGINT) AS window_start,
      |  event_type, count(*) AS n_events, round(sum(value), 6) AS sum_value
      |FROM events, LATERAL unnest(generate_series(0, 3)) AS t(k)
      |GROUP BY 1, 2""".stripMargin

  /** Tumbling 1-hour window aggregation per event_type. */
  def tumbling(spark: SparkSession, dir: String): DataFrame =
    Inputs.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 6).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("bucket_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  val tumblingOracle: String =
    """SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS bucket_start,
      |  event_type, count(*) AS n_events, round(sum(value), 6) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin
}
