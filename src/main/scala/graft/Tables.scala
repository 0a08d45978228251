package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
    * `events.ts` is normalized to EPOCH-NANOS LONG whatever the parquet
    * holds (the reference models all dates as Int64 day numbers anyway,
    * SURVEY §1.4): nanosecond-precision parquet reads as long directly
    * (`nanosAsLong` — Spark 4 rejects ns timestamps otherwise), and
    * micro-second timestamp parquet (the driver has shipped both across
    * rounds) is converted via `unix_micros` under a pinned-UTC session,
    * so every downstream `ts DIV 1000` / nano-literal compare keeps one
    * stable contract. The DuckDB oracles are unit-agnostic already
    * (`epoch_ns(ts)` accepts any timestamp precision).
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") df.schema("ts").dataType match {
      case LongType => df
      case TimestampNTZType | TimestampType =>
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case _ => df
    } else df
  }

  /** Register every fixture table as a temp view so `spark.sql` is a
    * full front door (combined with [[graft.plans.GraftExtensions]]
    * registering the native expressions as SQL functions, the whole
    * engine is reachable from SQL text). Idempotent. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
