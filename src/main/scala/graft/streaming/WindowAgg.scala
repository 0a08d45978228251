package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tumbling-window aggregation over event time — the canonical
  * Structured Streaming shape (readStream → window groupBy →
  * writeStream). The reference has no streaming at all (SURVEY §2.10);
  * its closest analog is the ordered-column stencil. Here the same
  * declarative aggregation runs over a batch DataFrame (backfill) and a
  * watermarked stream (live), which is the property that matters at
  * 100 TB: one query definition, two execution modes.
  *
  * Scale note: `window()` is just a derived grouping column — the
  * aggregation is an ordinary partial/final HashAggregate keyed on
  * (window, keys), so it shuffles only one reduced row per
  * (window × key), never raw events. With a watermark, streaming state
  * for closed windows is evicted, bounding memory on unbounded input.
  */
object WindowAgg {

  /** Batch tumbling-window counts + exact value sum.
    * `tsMicros` must be an epoch-microseconds long column.
    * Output: (window_start_us, window_end_us, keys..., n_events,
    * value_sum as decimal-exact double). */
  def tumbling(events: DataFrame, tsMicros: Column, width: String,
               key: String, value: Column): DataFrame =
    core(events.withColumn("__ts", timestamp_micros(tsMicros)), width,
      key, value)

  /** Streaming variant — identical aggregation plus a watermark so the
    * state store drops windows older than max(event time) - watermark. */
  def tumblingStreaming(events: DataFrame, tsMicros: Column, width: String,
                        key: String, value: Column,
                        watermark: String): DataFrame =
    core(events.withColumn("__ts", timestamp_micros(tsMicros))
      .withWatermark("__ts", watermark), width, key, value)

  /** Batch sliding (hopping) windows: width `width`, advancing every
    * `slide` — each event contributes to width/slide overlapping
    * windows. `window()` with a slide is still just a derived grouping
    * column (one row per covering window before the partial aggregate),
    * so the shuffle carries one reduced row per (window × key) and the
    * expansion factor is the fixed width/slide ratio, not data-derived. */
  def sliding(events: DataFrame, tsMicros: Column, width: String,
              slide: String, key: String, value: Column): DataFrame =
    core(events.withColumn("__ts", timestamp_micros(tsMicros)), width,
      key, value, slide = Some(slide))

  /** Streaming sliding windows with watermark-bounded state. */
  def slidingStreaming(events: DataFrame, tsMicros: Column, width: String,
                       slide: String, key: String, value: Column,
                       watermark: String): DataFrame =
    core(events.withColumn("__ts", timestamp_micros(tsMicros))
      .withWatermark("__ts", watermark), width, key, value,
      slide = Some(slide))

  private def core(df: DataFrame, width: String, key: String,
                   value: Column, slide: Option[String] = None): DataFrame = {
    val w = slide.fold(window(col("__ts"), width))(s =>
      window(col("__ts"), width, s))
    df.groupBy(w.as("w"), col(key))
      .agg(count(lit(1)).as("n_events"),
        sum(value.cast("decimal(18,2)")).cast("double").as("value_sum"))
      .select(unix_micros(col("w.start")).as("window_start_us"),
        unix_micros(col("w.end")).as("window_end_us"),
        col(key), col("n_events"), col("value_sum"))
  }
}
