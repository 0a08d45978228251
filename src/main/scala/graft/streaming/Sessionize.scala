package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event sessionization — the reference does this BY HAND in user code
  * (`/root/reference/examples/queries_devel/q02.jl:3-21`: a Julia
  * function splitting click sessions on a timeout); here it is a
  * first-class operator on `session_window`, which runs identically
  * over a batch DataFrame and a Structured Streaming source (with
  * watermarking), so the same pipeline serves backfill and live data.
  *
  * Session semantics: a new session starts when the gap to the previous
  * event of the same user is ≥ `gap`. Output session_start/session_end
  * are epoch-microsecond longs (ns-precision parquet timestamps don't
  * round-trip identically across engines — SURVEY gotcha).
  */
object Sessionize {

  /** Sessionize a batch of (user, ts-micros) events.
    * `tsMicros` must be an epoch-microseconds long column.
    * Returns (user_id, session_start_us, session_end_us, n_events,
    * value_sum as decimal-exact double). */
  def byGap(events: DataFrame, user: Column, tsMicros: Column,
            value: Column, gap: String): DataFrame =
    core(events.withColumn("__ts", timestamp_micros(tsMicros)),
      user, value, gap)

  /** Streaming variant: same aggregation with a watermark on the event
    * time so state for closed sessions is evicted — required for
    * unbounded sources. */
  def byGapStreaming(events: DataFrame, user: Column, tsMicros: Column,
                     value: Column, gap: String,
                     watermark: String): DataFrame =
    core(events.withColumn("__ts", timestamp_micros(tsMicros))
      .withWatermark("__ts", watermark),
      user, value, gap)

  private def core(df: DataFrame, user: Column, value: Column,
                   gap: String): DataFrame =
    df.groupBy(user.as("user_id"), session_window(col("__ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(value.cast("decimal(18,2)")).cast("double").as("value_sum"))
      .select(col("user_id"),
        unix_micros(col("w.start")).as("session_start_us"),
        unix_micros(col("w.end")).as("session_end_us"),
        col("n_events"), col("value_sum"))
}
