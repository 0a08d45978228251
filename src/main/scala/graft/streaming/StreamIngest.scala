package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Snapshot

/** Streaming CDC apply — the lake-side end of the streaming story: a
  * stream of keyed, versioned updates folded into a parquet table, one
  * copy-on-write merge per micro-batch (`foreachBatch` →
  * [[Snapshot.mergeUpsert]]), so downstream readers always see a plain
  * scannable table, never a change log they must replay.
  *
  * Disorder is handled at BOTH granularities — (key, version) pairs
  * are assumed unique, the usual CDC contract. Within a micro-batch,
  * multiple updates to one key collapse to the highest `version`
  * before the merge ([[Snapshot.latestByKey]]); across batches, the
  * merge itself is version-aware ([[Snapshot.mergeVersioned]]), so a
  * stale update arriving a batch late loses to the newer row already
  * in the table. Batch replays converge: the merge is idempotent for
  * identical inputs, so foreachBatch's at-least-once delivery yields
  * an exactly-once TABLE STATE (per-batch dedup, not per-row dedup —
  * a re-run batch rewrites the same rows to the same values).
  *
  * Scale: the COW merge is a full-table rewrite per batch — the floor
  * for an unpartitioned parquet target. At 100 TB the target is
  * day-partitioned and the merge goes through
  * `TextIO.overwritePartitions` on the touched partitions only; the
  * micro-batch cadence then sets the rewrite amplification, so size
  * triggers (`Trigger.ProcessingTime`) matter more than latency here.
  */
object StreamIngest {

  /** Start folding `updates` (streaming; columns must be
    * `key :: version :: payload…`, matching the table at `path`) into
    * the parquet table at `path`. The table must exist (seed it with
    * the initial snapshot); `checkpoint` makes restarts resume from the
    * last committed batch. */
  def upsertStream(updates: DataFrame, path: String, key: String,
                   version: String, checkpoint: String,
                   trigger: Trigger = Trigger.ProcessingTime(0)):
      StreamingQuery = {
    val payload = updates.columns.filterNot(_ == key).toSeq
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val latest = Snapshot
            .latestByKey(batch, col(key), col(version), col(version),
              payload)
            .withColumnRenamed("key", key)
          // Version-aware merge, not plain upsert: micro-batch BOUNDARIES
          // don't respect event order, so a stale update arriving a
          // batch late must lose to the newer row already in the table.
          Snapshot.mergeVersioned(batch.sparkSession, path, latest, key,
            version)
        }
      }
      .start()
  }
}
