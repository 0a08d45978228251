package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared lineage-truncation helpers for iterative builders.
  *
  * An iterative build whose round-N frame is derived from round N−1
  * (k-means cell updates, label propagation) accretes a logical plan
  * that nests every previous round. Even with each round persisted,
  * every LATER action on the result re-runs analysis, optimization,
  * and cache-lookup canonicalization over the WHOLE nested plan —
  * driver-side planning cost that grows with rounds and with embedded
  * literals, and is paid per use, at any data size (the table-path
  * kNN index measured 2–6 s of pure planning per probe on a 32-row
  * cell table this way). An EAGER `localCheckpoint` materializes the
  * frame and replaces its plan with a flat LogicalRDD — planning
  * becomes O(1), and the physical partitioning survives (Spark passes
  * the plan's outputPartitioning into the LogicalRDD), so keyed joins
  * against the checkpointed frame still skip their exchange.
  *
  * Checkpoint blocks are pinned outside the CacheManager (an external
  * `spark.catalog.clearCache()` cannot drop them) and are reclaimed
  * by the ContextCleaner once the frame is unreachable; for prompt
  * in-loop reuse, [[checkpointTracked]] returns the block-backing RDD
  * ids so a superseded round can be freed with [[free]] the moment
  * its successor is materialized. */
private[graft] object Frames {

  /** Eagerly checkpoint `df`; returns the flat-plan frame plus the
    * persistent-RDD ids that appeared across the call (the checkpoint
    * blocks), for later [[free]]. */
  def checkpointTracked(df: DataFrame): (DataFrame, Set[Int]) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet.toSet
    val out = df.localCheckpoint(true)
    (out, sc.getPersistentRDDs.keySet.toSet -- before)
  }

  /** Round-robin spread of a frame across the session's cores — ONLY
    * when the source actually has fewer partitions than
    * `defaultParallelism`. The unconditional `repartition(par)` this
    * replaces was motivated by small local fixtures arriving as one
    * parquet split (which pins the whole downstream scan stage to one
    * task), but at production scale the scan already has ample splits
    * and the repartition degenerates into a gratuitous full shuffle of
    * the operator's heaviest column (document text, embedding vectors)
    * — guide §2.4's "repartition someone added for parallelism".
    * Checking the physical partition count keeps the local fixture
    * behavior bit-for-bit (every caller feeds an order-free aggregate
    * or keyed exchange downstream) while letting a many-split corpus
    * skip the exchange entirely. Deriving the RDD costs one physical
    * planning of `df` (no job). */
  def spread(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= par) df else df.repartition(par)
  }

  /** Scale-adaptive width for an iterative loop's explicit keyed
    * repartition (guide §2.2/§2.4). An explicit `repartition(N, key)`
    * is invisible to AQE — user-specified partition counts are never
    * coalesced — so a constant N = conf width pins every loop stage
    * (and every per-iteration join that must co-partition with the
    * persisted frame) to the configured width regardless of data
    * size. At sf0.1 that is 32 near-empty tasks per stage per round —
    * pure dispatch overhead; the same iterative queries measured
    * FASTER at 8 cores than 32. Width here = ceil(optimizer-estimated
    * bytes / AQE's parallelism-first floor,
    * `coalescePartitions.minPartitionSize`), clamped to
    * [1, conf width]: the same sizing rule AQE's default
    * parallelism-first coalescing applies, applied to the one exchange
    * AQE cannot touch. (The 64 MB advisory target was measured first
    * and REJECTED: it sized q_pagerank's edge frame to ONE partition
    * and serialized ~1 s/iteration of genuinely parallel join+aggregate
    * compute — 2.99 → 5.2 s at sf0.1. The optimizer's estimate is
    * compressed-columnar bytes, so a shuffle-IO-sized target
    * under-provisions CPU-bound loop stages.) The
    * estimate is file-size-based for scans, propagates through
    * projections/joins, and survives `localCheckpoint` (LogicalRDD
    * carries originStats); an unknown estimate saturates huge and
    * falls back to the conf width — exactly today's behavior. At
    * corpus scale bytes/advisory far exceeds any sane conf width, so
    * the conf cap governs, as before. Costs one analysis+optimization
    * pass of `df` (no job). */
  def loopWidth(df: DataFrame): Int = {
    val conf = df.sparkSession.sessionState.conf
    val cap = math.max(1, conf.numShufflePartitions)
    val target = math.max(1L, conf.getConf(org.apache.spark.sql.internal
      .SQLConf.COALESCE_PARTITIONS_MIN_PARTITION_SIZE))
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val w = ((bytes + target - 1) / target)
      .min(BigInt(cap)).max(BigInt(1)).toInt
    if (sys.env.contains("SPARK_GRAFT_WIDTH_DEBUG"))
      System.err.println(s"[loopWidth] bytes=$bytes target=$target cap=$cap -> $w")
    w
  }

  /** Drop the blocks behind previously tracked checkpoint RDD ids.
    * Async on purpose: freed rounds are never referenced again, and
    * RDD blocks are keyed by unique rdd id — a late drop cannot be
    * plan-matched onto by anything (unlike CacheManager entries). */
  def free(df: DataFrame, ids: Set[Int]): Unit = {
    val sc = df.sparkSession.sparkContext
    sc.getPersistentRDDs.filter(kv => ids.contains(kv._1))
      .values.foreach(_.unpersist(false))
  }
}
