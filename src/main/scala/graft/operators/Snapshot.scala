package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture shapes over an append-only event log: latest-
  * record-per-key compaction (the upsert/merge read path) and a
  * two-snapshot diff. Beyond-reference surface — the ingest side of a
  * continuously refreshed training corpus (a crawl table is an
  * append-only log; training reads want the compacted latest state,
  * and incremental runs want the delta between two snapshot times).
  *
  * Scale shape:
  *  - [[latestByKey]] is ONE hash aggregate using `max_by` over a
  *    version struct — partial-aggregable, so each map task reduces
  *    its input to ≤ |keys-in-task| rows before the shuffle. The
  *    window-function alternative (row_number = 1) shuffles and sorts
  *    EVERY log row; at 100 TB of events the partial aggregate moves
  *    only the surviving records.
  *  - [[snapshotDiff]] compacts each side first (same aggregate), then
  *    one key-keyed full-outer join; nothing is ever pairwise.
  */
object Snapshot {

  /** Compact an append-only log to its latest record per key: for each
    * `key`, the row with the greatest (`version`, tie-break) — the
    * merge-on-read view of an upsert stream. `tiebreak` must make the
    * ordering total (e.g. a unique event id) or the result is
    * nondeterministic. Returns (key, payload...) with payload columns
    * taken from the winning row.
    */
  def latestByKey(log: DataFrame, key: Column, version: Column,
                  tiebreak: Column, payload: Seq[String]): DataFrame = {
    val versioned = struct(version.as("v"), tiebreak.as("t"))
    val row = struct(payload.map(col): _*)
    log.groupBy(key.as("key"))
      .agg(max_by(row, versioned).as("__latest"))
      .select(col("key") +: payload.map(p => col(s"__latest.$p").as(p)): _*)
  }

  /** Copy-on-write MERGE (upsert) into a parquet table: rows of
    * `updates` replace same-`key` rows of the table at `path`; new keys
    * append. The rewrite goes through a temp directory + two renames
    * (same crash contract as [[graft.sources.TextIO.compact]]: readers
    * see old or new, never a mix), and re-running the same updates is
    * idempotent. This is the write-side twin of [[latestByKey]]
    * (merge-on-read): pay the rewrite once at ingest and every
    * downstream read is a plain scan — the right trade when reads
    * dominate. Schemas must match by name.
    *
    * Scale note: a full-table rewrite is the COW floor; partition the
    * table and call this per affected partition (see
    * `TextIO.overwritePartitions`) so an incremental merge rewrites
    * only partitions the updates touch. */
  def mergeUpsert(spark: org.apache.spark.sql.SparkSession, path: String,
                  updates: DataFrame, key: String): Unit = {
    val target = spark.read.parquet(path)
    require(target.columns.sorted.sameElements(updates.columns.sorted),
      s"mergeUpsert schema mismatch: ${target.columns.mkString(",")} vs " +
        updates.columns.mkString(","))
    val cols = target.columns.toSeq
    val merged = target
      .join(updates.select(col(key)), Seq(key), "left_anti")
      .select(cols.map(col): _*)
      .unionByName(updates.select(cols.map(col): _*))
    atomicRewrite(spark, path, merged)
  }

  /** Version-aware MERGE: like [[mergeUpsert]], but an update only
    * replaces a same-key row when its `version` is HIGHER — a late or
    * replayed lower-version update is a no-op, so out-of-order
    * delivery still converges to highest-version-wins (the guard
    * [[mergeUpsert]] deliberately lacks: it implements last-writer-
    * wins for callers who already ordered their batches). Updates win
    * version ties, which under the (key, version)-unique CDC contract
    * can only be an identical-row replay — keeping re-application
    * idempotent. One aggregate over target ∪ updates; same atomic
    * rewrite contract as [[mergeUpsert]]. */
  def mergeVersioned(spark: org.apache.spark.sql.SparkSession, path: String,
                     updates: DataFrame, key: String,
                     version: String): Unit = {
    val target = spark.read.parquet(path)
    require(target.columns.sorted.sameElements(updates.columns.sorted),
      s"mergeVersioned schema mismatch: ${target.columns.mkString(",")} vs " +
        updates.columns.mkString(","))
    val cols = target.columns.toSeq
    val payload = cols.filterNot(_ == key)
    val merged = latestByKey(
      target.withColumn("__src", lit(0))
        .unionByName(updates.select(cols.map(col): _*)
          .withColumn("__src", lit(1))),
      col(key), col(version), col("__src"), payload)
      .withColumnRenamed("key", key)
      .select(cols.map(col): _*)
    atomicRewrite(spark, path, merged)
  }

  /** Rewrite the parquet table at `path` to `df` through a temp
    * directory and two renames — readers see the old or the new table,
    * never a mix; a crash between the renames leaves the old state
    * recoverable under `.__merge_old`. */
  private def atomicRewrite(spark: org.apache.spark.sql.SparkSession,
                            path: String, df: DataFrame): Unit = {
    val tmp = path.stripSuffix("/") + ".__merge_tmp"
    df.write.mode("overwrite").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    val src = new org.apache.hadoop.fs.Path(tmp)
    val old = new org.apache.hadoop.fs.Path(path + ".__merge_old")
    if (fs.exists(old)) fs.delete(old, true)
    fs.rename(dst, old)
    fs.rename(src, dst)
    fs.delete(old, true)
  }

  /** Diff the compacted state of a log at two cut timestamps
    * (exclusive): rows `added` (key only in the newer snapshot),
    * `removed` (only in the older — possible when keys are created by
    * late events only after cut1... absent with append-only keys, but
    * the operator supports arbitrary snapshot pairs), `changed`
    * (both, different value), `unchanged` dropped. Returns
    * (key, status, old_value, new_value).
    */
  def snapshotDiff(log: DataFrame, key: Column, version: Column,
                   tiebreak: Column, value: Column,
                   cutOld: Column, cutNew: Column): DataFrame = {
    def snap(cut: Column): DataFrame =
      latestByKey(log.select(key, version, tiebreak, value.as("value"))
        .filter(version < cut), key, version, tiebreak, Seq("value"))
    // Presence flags, not value-is-null checks — a legitimately null
    // payload value must not masquerade as a missing key.
    val o = snap(cutOld).withColumnRenamed("value", "old_value")
      .withColumn("__in_old", lit(true))
    val n = snap(cutNew).withColumnRenamed("value", "new_value")
      .withColumn("__in_new", lit(true))
    o.join(n, Seq("key"), "full_outer")
      .withColumn("status",
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(col("old_value") <=> col("new_value"), lit("unchanged"))
          .otherwise(lit("changed")))
      .filter(col("status") =!= "unchanged")
      .drop("__in_old", "__in_new")
  }

  /** Slowly-changing-dimension (type 2) history: one row per log
    * record with its validity interval — `valid_from` = its version,
    * `valid_to` = the next version of the same key (the `noCurrent`
    * sentinel, −1 by default, for the current record; a NULL here
    * would flip the column to float64 in arrow/pandas readers and
    * lose epoch-nano precision). The window is keyed per `key` —
    * partition-parallel; no global sort anywhere. */
  def scd2History(log: DataFrame, key: Column, version: Column,
                  tiebreak: Column, value: Column,
                  noCurrent: Long = -1L): DataFrame = {
    val w = Window.partitionBy(col("key"))
      .orderBy(col("valid_from"), col("__tb"))
    log.select(key.as("key"), version.as("valid_from"),
      tiebreak.as("__tb"), value.as("value"))
      .withColumn("__next", lead(col("valid_from"), 1).over(w))
      .withColumn("valid_to", coalesce(col("__next"), lit(noCurrent)))
      .withColumn("is_current", col("__next").isNull.cast("int"))
      .drop("__tb", "__next")
  }
}
