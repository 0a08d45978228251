package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Capture the QueryExecutions of every action a block triggers.
  *
  * Operators that return an eagerly-materialized frame (localCheckpoint
  * — the repeat-execution-safe lifecycle) hand back a flat LogicalRDD
  * plan, so a spec can no longer read the interesting operators off the
  * RESULT's plan; they ran inside the materializing action. This helper
  * registers a QueryExecutionListener for the duration of the block and
  * returns every execution it saw (including checkpoint actions), so
  * plan-quality assertions can look at the plans that actually
  * executed. Listener delivery is async — poll until at least
  * `minPlans` arrive (10 s timeout), then settle briefly. */
object PlanCapture {
  def during(spark: SparkSession, minPlans: Int = 1)
            (body: => Unit): Seq[QueryExecution] = {
    val got = new java.util.concurrent.ConcurrentLinkedQueue[QueryExecution]()
    val l = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = got.add(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = got.add(qe)
    }
    spark.listenerManager.register(l)
    try {
      body
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (got.size() < minPlans && System.nanoTime() < deadline)
        Thread.sleep(50)
      Thread.sleep(200) // let stragglers land
    } finally spark.listenerManager.unregister(l)
    import scala.jdk.CollectionConverters._
    got.asScala.toSeq
  }
}
