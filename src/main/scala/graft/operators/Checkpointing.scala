package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Checkpoint/restart for iterative driver loops — the reference's
  * `hpat_checkpoint` / `func_restart` pair
  * (/root/reference/src/HPAT.jl:246-260 save, :310-328 restart;
  * src/checkpoint.jl writes the loop counter + live arrays, restart
  * re-enters the loop at the saved iteration).
  *
  * Spark shape: the state table is written as parquet into a
  * per-iteration subdirectory on any Hadoop filesystem (HDFS/S3 at
  * cluster scale), and an `_ITER` marker file is renamed into place
  * LAST — a torn save (job killed mid-write) leaves the previous marker
  * intact, so restore never sees a partial state. Each save lands in
  * its own `state-<iter>` directory, so a restore that is concurrently
  * reading iteration k is never overwritten by the save of k+1; the
  * save of iteration k deletes `state-(k-every)` afterwards, keeping at
  * most two snapshots on disk.
  */
object Checkpointing {

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Durably save `(iter, state)`: parquet first, marker rename last. */
  def saveState(state: DataFrame, dir: String, iter: Int): Unit = {
    val spark = state.sparkSession
    state.write.mode("overwrite").parquet(s"$dir/state-$iter")
    val f = fs(spark, dir)
    val tmp = new Path(s"$dir/_ITER.tmp")
    val out = f.create(tmp, true)
    out.write(iter.toString.getBytes("UTF-8"))
    out.close()
    val marker = new Path(s"$dir/_ITER")
    if (f.exists(marker)) f.delete(marker, false)
    f.rename(tmp, marker)
  }

  /** The saved iteration + state, or None when no complete save
    * exists. */
  def restoreState(spark: SparkSession, dir: String): Option[(Int, DataFrame)] = {
    val f = fs(spark, dir)
    val marker = new Path(s"$dir/_ITER")
    if (!f.exists(marker)) None
    else {
      val in = f.open(marker)
      val iter = try scala.io.Source.fromInputStream(in).mkString.trim.toInt
                 finally in.close()
      Some((iter, spark.read.parquet(s"$dir/state-$iter")))
    }
  }

  /** Run `step` for iterations `restored..totalIters-1`, checkpointing
    * every `every` iterations — the `func_restart` entry point: calling
    * it again after a mid-loop failure resumes from the last complete
    * save instead of iteration 0. `init` is only evaluated on a cold
    * start. */
  def resumableLoop(spark: SparkSession, dir: String, totalIters: Int,
                    every: Int)(init: => DataFrame)(
                    step: (DataFrame, Int) => DataFrame): DataFrame = {
    require(totalIters >= 0 && every >= 1)
    val (start, init0) = restoreState(spark, dir).getOrElse((0, init))
    var cur = init0
    for (i <- start until totalIters) {
      cur = step(cur, i)
      if ((i + 1) % every == 0 || i + 1 == totalIters) {
        saveState(cur, dir, i + 1)
        val stale = new Path(s"$dir/state-${i + 1 - every}")
        val f = fs(spark, dir)
        if (f.exists(stale)) f.delete(stale, true)
        // state now reads from the snapshot — lineage to the original
        // input (and to all pre-failure work) is cut, like the
        // reference's restart reading arrays back from the file.
        cur = spark.read.parquet(s"$dir/state-${i + 1}")
      }
    }
    cur
  }
}
