package graft.tools

import org.apache.spark.sql.SparkSession

/** Time a single SparkEntry query by name (dev tool).
  * Usage: runMain graft.tools.ProfileQuery <name> [sfDir] [reps] */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    val dirs = if (args.length > 3) Seq(args(3), dir) else Seq.fill(reps)(dir)
    for ((d, i) <- dirs.zipWithIndex) {
      val t0 = System.nanoTime()
      val n = fn(spark, d).count()
      println(f"[$name rep$i] rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
