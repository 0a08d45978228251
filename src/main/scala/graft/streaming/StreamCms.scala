package graft.streaming

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Sketch

/** Streaming approximate frequency counts — the online form of
  * [[graft.operators.Sketch.cmsSketch]]/`cmsEstimate`: per group, a
  * depth×width count-min counter array held in
  * `flatMapGroupsWithState`, incremented per micro-batch, emitting the
  * running estimate for every item that arrived in the batch. The
  * bucket derivation (md5 of "r:key", first 16 bits mod width) and the
  * min-over-rows estimate are exactly the ones the batch/SQL sketch
  * computes, so a single-batch execution of this operator hash-matches
  * the same DuckDB mirror that backs `q_cms_counts`.
  *
  * Scale design: state per group is depth·width longs (8 KiB at the
  * default 4×256), forever — counters never grow with the key space,
  * so no TTL is needed. Estimates only ever overestimate (collisions
  * add, counters are monotone), which also gives the streaming law the
  * spec pins: an estimate emitted at batch t is ≤ the estimate the
  * full stream produces.
  *
  * The batch wrapper buffers each group's distinct items on the task
  * heap before emitting; for frequency tables over unbounded batch
  * corpora prefer [[graft.operators.Sketch.cmsEstimate]] (fully
  * relational). This operator's value is the incremental state.
  */
object StreamCms {

  case class Est(g: String, item: String, est: Long)
  case class Counters(m: Array[Long])

  /** JVM mirror of [[graft.operators.Sketch.cmsBucket]]: first two md5
    * bytes of "r:key" (= the first 4 hex digits), mod width. */
  private[streaming] def bucket(r: Int, key: String,
                                width: Int = Sketch.CmsWidth): Int = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s"$r:$key".getBytes(StandardCharsets.UTF_8))
    (((d(0) & 0xff) << 8) | (d(1) & 0xff)) % width
  }

  private def core(ds: Dataset[(String, String)]): Dataset[Est] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val depth = Sketch.CmsDepth
    val width = Sketch.CmsWidth
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[Counters, Est](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (g: String, rows: Iterator[(String, String)],
         state: GroupState[Counters]) =>
          val m = if (state.exists) state.get.m.clone()
                  else new Array[Long](depth * width)
          val seen = mutable.LinkedHashSet.empty[String]
          rows.foreach { case (_, item) =>
            var r = 0
            while (r < depth) {
              m(r * width + bucket(r, item, width)) += 1L
              r += 1
            }
            seen += item
          }
          state.update(Counters(m))
          seen.iterator.map { item =>
            var est = Long.MaxValue
            var r = 0
            while (r < depth) {
              val c = m(r * width + bucket(r, item, width))
              if (c < est) est = c
              r += 1
            }
            Est(g, item, est)
          }
      }
  }

  /** Batch form: per-(group, item) running-count estimate over the
    * whole frame — identical numbers to the relational
    * [[graft.operators.Sketch.cmsEstimate]] built per group. */
  def estimates(df: DataFrame, group: Column, item: Column,
                groupOut: String = "g", itemOut: String = "item",
                out: String = "est"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    core(df.select(group.cast("string"), item.cast("string"))
      .as[(String, String)])
      .toDF(groupOut, itemOut, out)
  }

  /** Streaming form: per micro-batch, the running estimate for each
    * item present in the batch (use OutputMode.Update). */
  def estimatesStream(ds: Dataset[(String, String)]): Dataset[Est] =
    core(ds)
}
