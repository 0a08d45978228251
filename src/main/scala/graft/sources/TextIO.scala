package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Delimited-text source/sink — parity with the reference's
  * `DataSource(Matrix{T}, TXT, file)` / `DataSink(y, TXT, file)`
  * (reference src/api.jl:22-25, src/domain-pass.jl:770-810,889-911;
  * MPI-chunked readdlm semantics and rank-ordered write).
  *
  * Spark equivalents: the csv source splits files by byte range so every
  * executor reads its own chunk (same shape as the reference's
  * MPI-chunked read), and writes emit one part-file per partition (the
  * rank-ordered write). Schema is declared up front, matching the
  * reference's static-schema discipline (SURVEY §1.3) — no inference
  * pass over 100 TB of text.
  */
object TextIO {

  /** Read a whitespace/char-delimited text file with a declared schema. */
  def readDelimited(spark: SparkSession, path: String, schema: StructType,
                    delimiter: String = " "): DataFrame =
    spark.read.schema(schema).option("delimiter", delimiter).csv(path)

  /** Rank-ordered parallel text write (one part per partition). */
  def writeDelimited(df: DataFrame, path: String,
                     delimiter: String = " "): Unit =
    df.write.mode("overwrite").option("delimiter", delimiter).csv(path)

  /** Delimited read that SURVIVES malformed rows instead of failing
    * the job — the ingest posture for crawled/third-party text at
    * 100 TB, where some fraction of lines is always broken. PERMISSIVE
    * mode: a row whose tokens don't parse into the declared schema
    * gets nulls for the bad fields and its raw line captured in the
    * `_corrupt` column (good rows carry `_corrupt` = null); downstream
    * splits the frame with one `_corrupt IS NULL` filter riding the
    * scan — no second pass, no job restart, and the bad lines remain
    * inspectable/quarantinable data rather than an exception trace. */
  def readDelimitedPermissive(spark: SparkSession, path: String,
                              schema: StructType,
                              delimiter: String = " "): DataFrame =
    spark.read
      .schema(schema.add("_corrupt", org.apache.spark.sql.types.StringType))
      .option("delimiter", delimiter)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(path)

  /** Columnar sink — parity with `DataSink(arr, HDF5, ...)`'s parallel
    * collective write (reference src/cgen-hpat-pattern-match.jl:1201-1269);
    * on Spark the scale path is parquet, one columnar file per partition. */
  def writeColumnar(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  def readColumnar(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Schema-evolution read: union the footer schemas of every file
    * under `paths` (an ingest table written over months gains columns;
    * files predating a column yield nulls for it). `mergeSchema` costs
    * one footer read per file at planning time — fine for an explicit
    * evolved read, wrong as a default at 100 TB (millions of footers),
    * which is why [[readColumnar]] keeps the cheap
    * first-file-schema path and evolution is opt-in here. Pushdown
    * and pruning survive: a filter on a late-added column prunes
    * old files entirely (their row groups have no such column —
    * all-null stats). */
  def readColumnarEvolved(spark: SparkSession, paths: String*): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)

  /** ORC columnar sink/source — the second columnar interchange format
    * (Hive/Trino lakes). Same pushdown/pruning contract as parquet:
    * predicate pushdown via ORC SearchArguments, column pruning via the
    * read schema, one stripe-aligned split per task. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** JSON-lines sink (one object per line, one part per partition) —
    * the interchange format training-data pipelines live on. */
  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** JSON-lines source with a declared schema — like every source here,
    * no inference pass over 100 TB of text; files split by byte range. */
  def readJsonLines(spark: SparkSession, path: String,
                    schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Hive-layout partitioned columnar sink: one directory per partition
    * value, so a filter on the partition column prunes whole directories
    * at planning time (PartitionFilters in the scan) — at 100 TB the
    * difference between scanning a shard and scanning the lake. */
  def writePartitionedColumnar(df: DataFrame, path: String,
                               partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Idempotent backfill: overwrite ONLY the hive partitions present
    * in `df`, leaving every other partition untouched (dynamic
    * partition overwrite). This is how a 100 TB lake reprocesses one
    * day — rewriting the affected partitions, not the table; re-runs
    * converge to the same state. */
  def overwritePartitions(df: DataFrame, path: String,
                          partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Small-file compaction: rewrite a lake directory into one file
    * per hive partition value (partitioned) or `numFiles` files
    * (unpartitioned). Streaming ingest leaves file counts
    * proportional to trigger count × partitions; metadata and
    * open-file overhead then dominate 100 TB scans — compaction
    * restores scan-sized files. The rewrite goes through a temp
    * directory and a rename swap, so no reader ever sees a mix of old
    * and new files; a crash between the two renames can leave the
    * table path momentarily absent (recoverable from the `.old`
    * directory) — raw filesystems cannot do better; table formats
    * with a metadata pointer exist for exactly this reason. */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              partitionCols: Seq[String], numFiles: Int = 1): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    val df = spark.read.parquet(path)
    val tmp = path.stripSuffix("/") + ".__compact_tmp"
    // hash-repartitioning on the partition columns lands each value in
    // exactly one task → exactly one output file per partition value
    (if (partitionCols.nonEmpty)
       df.repartition(partitionCols.map(
         org.apache.spark.sql.functions.col): _*)
         .write.mode("overwrite").partitionBy(partitionCols: _*)
     else df.coalesce(numFiles).write.mode("overwrite"))
      .parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    val src = new org.apache.hadoop.fs.Path(tmp)
    val old = new org.apache.hadoop.fs.Path(path + ".__compact_old")
    fs.rename(dst, old)
    fs.rename(src, dst)
    fs.delete(old, true)
  }
}
