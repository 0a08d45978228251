package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-isolation probe for the Gram/GEMM hot path: times (a) the
  * per-row blocked outer-product projection alone, (b) projection +
  * exact-decimal block aggregate, (c) the registered q_gemm_gram, to
  * attribute cost between interpreted HOF lambdas and the exact sum. */
object GemmProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dim = 64; val bs = 16; val nb = dim / bs
    val e = graft.Tables.load(spark, dir, "embeddings")
    def time(tag: String)(f: => Long): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"[$tag rep$i] n=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    val x = transform(col("embedding"), v => v.cast("double"))
    def outerBlock(xc: org.apache.spark.sql.Column, bi: Int, bj: Int) = {
      val si = slice(xc, bi * bs + 1, bs)
      val sj = slice(xc, bj * bs + 1, bs)
      flatten(transform(si, xi => transform(sj, xj => xi * xj)))
    }
    val blockRows = for { bi <- 0 until nb; bj <- 0 until nb }
      yield struct(lit(bi).as("bi"), lit(bj).as("bj"),
        outerBlock(col("x"), bi, bj).as("p"))
    val exploded = e.select(x.as("x"))
      .select(explode(array(blockRows: _*)).as("b"))
      .select(col("b.bi").as("bi"), col("b.bj").as("bj"), col("b.p").as("p"))

    time("projection-only")(exploded.select(sum(size(col("p")))).head().getLong(0))
    time("proj+exactsum")(
      exploded.groupBy("bi", "bj")
        .agg(graft.functions.ExactSumFunctions.exactVectorSum(col("p")).as("m"))
        .count())
    time("q_gemm_gram")(
      graft.SparkEntry.queries("q_gemm_gram")(spark, dir).count())
    time("q_gemm_multiply")(
      graft.SparkEntry.queries("q_gemm_multiply")(spark, dir).count())

    // multiply sub-stages
    import graft.operators.Gemm
    val xCoo = e.select(col("vec_id").as("i"),
      posexplode(transform(col("embedding"), v => v.cast("double")))
        .as(Seq("j", "v")))
    val wCoo = xCoo.filter(col("i") < 64)
    time("xCoo")(xCoo.count())
    time("toBlocks(x)")(
      Gemm.toBlocks(xCoo, bs).agg(sum(size(col("m")))).head().getLong(0))
    val a = Gemm.toBlocks(xCoo, bs).cache(); a.count()
    val b = Gemm.toBlocks(wCoo, bs).cache(); b.count()
    time("multiply(cached blocks)")(
      Gemm.multiplyBlocked(a, b, bs)
        .agg(sum(size(col("m")))).head().getLong(0))
    time("blocksToCoo+semi")(
      Gemm.blocksToCoo(Gemm.multiplyBlocked(a, b, bs), bs)
        .join(broadcast(xCoo.select(col("i")).distinct()), Seq("i"),
          "left_semi").count())
    a.unpersist(); b.unpersist()
    spark.stop()
  }
}
