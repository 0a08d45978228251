package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ZOrderKey

/** Multi-dimensional file-layout clustering (Z-ORDER) — the write-side
  * optimization that makes 100 TB scans cheap on the read side: rows
  * close in BOTH clustering dimensions land in the same output files,
  * so parquet per-file/row-group min-max statistics prune scans
  * filtered on EITHER dimension. A single-column sort gives pruning on
  * one dimension only; the Morton key ([[ZOrderKey]]) gives it on both
  * at the cost of one extra sort at write time.
  */
object Layout {

  /** Cluster `df` into `numFiles` write tasks by Z-order of the two
    * dimensions: range-partition on the Morton key (equal-frequency
    * boundaries from Spark's range sampler), then sort within each
    * partition so row groups inside a file are clustered too. Writing
    * the result with any columnar sink yields the clustered layout. */
  def zorderLayout(df: DataFrame, dimX: Column, dimY: Column,
                   numFiles: Int): DataFrame = {
    require(numFiles > 0, "numFiles must be positive")
    val keyed = df.withColumn("__z", ZOrderKey.zorder(dimX, dimY))
    keyed.repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Per-file clustering statistics for a laid-out frame: for each
    * write task (file), the count and min/max of both dimensions —
    * exactly the footer stats a reader's skipping logic would consult.
    * The tighter the per-file ranges, the more files a point/range
    * predicate skips. */
  def fileStats(df: DataFrame, dimX: Column, dimY: Column): DataFrame =
    df.withColumn("__file", spark_partition_id())
      .groupBy(col("__file"))
      .agg(count(lit(1)).as("n_rows"),
        min(dimX).as("x_min"), max(dimX).as("x_max"),
        min(dimY).as("y_min"), max(dimY).as("y_max"))

  /** Mean per-file predicate selectivity for a point lookup on one
    * dimension: the fraction of files whose [min,max] on that
    * dimension contains an average point — a direct proxy for the
    * fraction of a 100 TB table a filtered scan must read. */
  def pruneFraction(dim: String, domainWidth: Long): Column =
    (sum(col(s"${dim}_max") - col(s"${dim}_min") + 1) /
      (count(lit(1)) * domainWidth)).as(s"${dim}_read_fraction")

  /** Deterministic training-shard layout: shuffle the corpus into a
    * content-hash global order (the "randomize example order once at
    * write time" step before sequential training reads) and cut it
    * into fixed-size shards — every row gets (shard, pos), shard
    * `k` holding global positions [k·shardSize, (k+1)·shardSize).
    *
    * The order is md5 of the key, so the permutation is reproducible
    * across runs/engines/partitionings and uncorrelated with any data
    * column; positions come from [[Series.globalRowNumbers]] (range
    * partition + per-partition count exscan — O(partitions) driver
    * state, NO global single-task sort at 100 TB). Writing partitioned
    * by `shard` then yields equal-size sequential-read training files.
    * Returns the input columns plus `shard` and `pos`. */
  def trainShards(df: DataFrame, key: Column, shardSize: Long): DataFrame = {
    require(shardSize > 0, "shardSize must be positive")
    val ordered = Series.globalRowNumbers(
      df.withColumn("__h", md5(key.cast("string"))), col("__h"), "__rid")
    ordered
      .withColumn("shard", expr("__rid div " + shardSize + "L"))
      .withColumn("pos", col("__rid") % shardSize)
      .drop("__h", "__rid")
  }
}
