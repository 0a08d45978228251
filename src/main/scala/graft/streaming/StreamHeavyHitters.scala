package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming heavy hitters — Misra–Gries (space-saving) summaries per
  * group in `mapGroupsWithState`: at most `capacity` counters per
  * group, each arrival either increments its counter, claims a free
  * slot, or decrements every counter (the MG step). State is O(capacity)
  * FOREVER — the frequency analog of [[StreamSketch]]'s HLL.
  *
  * Guarantee (the classic MG bound, pinned by spec): for every item,
  * `true_count − n/ (capacity+1) ≤ estimate ≤ true_count`, and any item
  * with true count > n/(capacity+1) is PRESENT in the summary. So with
  * capacity sized to the group's distinct-item count the summary is
  * exact; under pressure it degrades to the one-sided bound, never
  * silently.
  *
  * Determinism: within a micro-batch, rows apply in (ts, item) order,
  * and the evicted/"decrement" step is a pure function of that order —
  * the same stream replayed through the same triggers yields the same
  * summary. (Unlike HLL/CMS the MG summary is order-DEPENDENT between
  * different batchings; the spec pins the bound, not cross-batching
  * equality.)
  */
object StreamHeavyHitters {

  case class Hit(g: String, item: String, est: Long)
  private[streaming] case class Summary(items: Map[String, Long])

  private def mgStep(m0: Map[String, Long], item: String,
                     capacity: Int): Map[String, Long] =
    m0.get(item) match {
      case Some(c) => m0.updated(item, c + 1L)
      case None if m0.size < capacity => m0.updated(item, 1L)
      case None =>
        // decrement all; drop zeros (the item itself is NOT inserted)
        m0.flatMap { case (k, c) =>
          if (c > 1L) Some(k -> (c - 1L)) else None
        }
    }

  private def core(ds: Dataset[(String, String, Long)],
                   capacity: Int, k: Int): Dataset[Hit] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[Summary, Hit](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (g: String, rows: Iterator[(String, String, Long)],
         state: GroupState[Summary]) =>
          var m = state.getOption.map(_.items).getOrElse(Map.empty)
          rows.toArray.sortBy(r => (r._3, r._2))
            .foreach { r => m = mgStep(m, r._2, capacity) }
          state.update(Summary(m))
          m.toSeq.sortBy { case (item, c) => (-c, item) }.take(k)
            .map { case (item, c) => Hit(g, item, c) }.iterator
      }
  }

  /** Batch form: top-k MG summary per group (exact when `capacity`
    * covers the group's distinct items). */
  def topK(df: DataFrame, group: Column, item: Column, order: Column,
           capacity: Int, k: Int): Dataset[Hit] = {
    val spark = df.sparkSession
    import spark.implicits._
    core(df.select(group.cast("string"), item.cast("string"),
      order.cast("long")).as[(String, String, Long)], capacity, k)
  }

  /** Streaming form: running top-k per group each trigger
    * (OutputMode.Update recommended downstream). */
  def topKStream(ds: Dataset[(String, String, Long)], capacity: Int,
                 k: Int): Dataset[Hit] =
    core(ds, capacity, k)
}
