package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Prune

/** Runtime evidence for the shuffle-volume claims: measure actual
  * shuffle WRITE bytes through a SparkListener and assert the
  * documented reductions hold — not just that the plan looks right.
  */
class ShuffleBytesSpec extends SparkSpec {

  /** Total shuffle bytes written while computing `df` (fresh listener,
    * waited to drain). */
  private def shuffleBytes(df: => DataFrame): Long = {
    val bytes = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        bytes.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      df.collect()
      // listenerBus is private — poll until the async bus has drained
      // (byte totals stop moving)
      var prev = -1L
      var cur = bytes.get()
      var spins = 0
      while (cur != prev && spins < 50) {
        Thread.sleep(100); prev = cur; cur = bytes.get(); spins += 1
      }
      cur
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("bloom prefilter cuts the fact side's shuffle bytes on a shuffle join") {
    val dir = "/root/testdata/sf0.01"
    val dim = Tables.load(spark, dir, "part")
      .filter(col("p_size") <= 2).select(col("p_partkey"))
    val fact = Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_quantity"))
    // force a shuffle (sort-merge) join on both variants: the exchange
    // of the fact side is exactly what the bloom is supposed to cut
    def agg(f: DataFrame) = f
      .join(dim.hint("merge"), col("l_partkey") === col("p_partkey"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("q"))
    val plain = shuffleBytes(agg(fact))
    val bloomed = shuffleBytes(agg(
      Prune.bloomPrefilter(fact, col("l_partkey"), dim, col("p_partkey"))))
    // identical results…
    val a = agg(fact).head(); val b = agg(
      Prune.bloomPrefilter(fact, col("l_partkey"), dim, col("p_partkey"))).head()
    assert(a == b, s"results diverge: $a vs $b")
    // …at a fraction of the shuffle: dim keeps ~4% of parts, so the
    // pruned fact exchange must be well under half the plain one.
    assert(plain > 0, "expected a real exchange in the plain join")
    assert(bloomed < plain / 2,
      s"bloom prefilter didn't cut shuffle: $bloomed vs $plain bytes")
  }
}
