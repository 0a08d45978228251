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

  /** Sub-sharded form — the 1000-executor topology (see
    * [[StreamSketch.approxDistinctSharded]] for the rationale: state
    * keyed on the group alone caps stateful parallelism at the group
    * count). CMS counters SUM exactly — each occurrence increments
    * exactly one shard's counter at the same (r, bucket) address the
    * unsharded sketch would — so state sub-shards to (group,
    * hash(item) % shards) and the per-group elementwise counter sum
    * reproduces the unsharded array bit-for-bit. The estimate stage is
    * then fully RELATIONAL (the summed (g, r, b, cnt) table is
    * group·depth·width rows — broadcast-small — joined against the
    * distinct probes through the same [[Sketch.cmsBucket]]
    * derivation), which also removes the unsharded batch wrapper's
    * per-task distinct-item heap buffering. Same numbers, same
    * oracle; StreamingSpec pins the equality. */
  def estimatesSharded(df: DataFrame, group: Column, item: Column,
                       shards: Int,
                       groupOut: String = "g", itemOut: String = "item",
                       out: String = "est"): DataFrame = {
    require(shards >= 1, "shards must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val depth = Sketch.CmsDepth
    val width = Sketch.CmsWidth
    val keyed = df.select(group.cast("string").as("g"),
      item.cast("string").as("item"))
    val perShard = keyed.as[(String, String)]
      .groupByKey(t => (t._1, math.floorMod(t._2.hashCode, shards)))
      .mapGroupsWithState[Counters, (String, Array[Long])](
        GroupStateTimeout.NoTimeout()) {
        (gk: (String, Int), rows: Iterator[(String, String)],
         state: GroupState[Counters]) =>
          val m = if (state.exists) state.get.m.clone()
                  else new Array[Long](depth * width)
          rows.foreach { case (_, it) =>
            var r = 0
            while (r < depth) {
              m(r * width + StreamCms.bucket(r, it, width)) += 1L
              r += 1
            }
          }
          state.update(Counters(m))
          (gk._1, m)
      }
    // elementwise sum across shards, addressed as (g, r, b, cnt) —
    // group·depth·width rows, broadcast-small at any corpus size
    val sketch = perShard.toDF("g", "m")
      .select(col("g"), posexplode(col("m")).as(Seq("idx", "c")))
      .groupBy(col("g"), (col("idx") / width).cast("int").as("r"),
        (col("idx") % width).as("b"))
      .agg(sum(col("c")).as("cnt"))
    val probes = keyed.distinct()
      .select(col("g"), col("item"), posexplode(array((0 until depth).map(r =>
        Sketch.cmsBucket(col("item"), r, width)): _*)).as(Seq("r", "b")))
    probes.join(broadcast(sketch), Seq("g", "r", "b"), "left")
      .groupBy(col("g"), col("item"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as(out))
      .withColumnRenamed("g", groupOut)
      .withColumnRenamed("item", itemOut)
  }
}
