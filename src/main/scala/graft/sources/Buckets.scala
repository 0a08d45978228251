package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout — the co-located join path.
  *
  * A join between two tables bucketed by the join key into the same
  * bucket count needs NO exchange at query time: each task reads
  * matching bucket files from both sides (Spark's analog of the
  * reference pre-partitioning both join inputs by `key % num_pes`
  * before its alltoallv — except the partitioning is done once at
  * write time and amortized over every subsequent join). At 100 TB
  * this turns the dominant shuffle of a repeated fact-dim join into a
  * pure scan.
  *
  * Bucketed writes go through the session catalog (`saveAsTable` —
  * bucketing metadata lives in the table definition, not the files).
  */
object Buckets {

  /** Write `df` as a bucketed, per-bucket-sorted catalog table.
    * Drops any previous table AND its orphaned warehouse directory
    * first (the in-memory catalog forgets tables across sessions, the
    * filesystem does not). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    // Unqualified names only: a "db.tbl" name lives under `db.db/tbl`
    // in the warehouse (and a non-default current database relocates
    // it again), so the orphan-directory cleanup below would miss the
    // real location and saveAsTable could read mixed files.
    require(!table.contains("."),
      s"writeBucketed takes an unqualified table name, got '$table'")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata attached). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
