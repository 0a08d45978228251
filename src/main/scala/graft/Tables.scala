package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loader.
  *
  * The reference reads one HDF5 dataset per column via collective MPI I/O
  * (`/root/reference/src/capture-api.jl:609-635`,
  * `src/cgen-hpat-pattern-match.jl:849-1048`). On Spark the equivalent
  * scale-path is a columnar Parquet scan: each executor reads its own row
  * groups, column pruning and predicate pushdown happen at the source.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read a named fixture table from a scale-factor directory.
    *
    * `events.ts` is nanosecond-precision parquet, which Spark 4 rejects
    * by default — read it as epoch-nanos long (the reference models all
    * dates as Int64 day numbers anyway, SURVEY §1.4).
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Register every fixture table as a temp view so `spark.sql` is a
    * full front door (combined with [[graft.plans.GraftExtensions]]
    * registering the native expressions as SQL functions, the whole
    * engine is reachable from SQL text). Idempotent. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
