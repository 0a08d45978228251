package graft

import org.apache.spark.sql.functions._

import graft.sources.Buckets

/** Bucketed co-located join: same-bucketed tables join with no
  * exchange, and the result is identical to the shuffled join. */
class BucketsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("same-bucket-count tables join without a shuffle, same result") {
    val orders = Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Tables.load(spark, sf, "customer")
      .select("c_custkey", "c_name")
    Buckets.writeBucketed(orders, "b_orders", "o_custkey", 4)
    Buckets.writeBucketed(customer, "b_customer", "c_custkey", 4)

    val bo = Buckets.readBucketed(spark, "b_orders")
    val bc = Buckets.readBucketed(spark, "b_customer")
    // merge hint forces the shuffle-sensitive SMJ path (tiny customer
    // side would otherwise auto-broadcast and hide the bucketing)
    val joined = bo.hint("merge").join(bc, bo("o_custkey") === bc("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle:\n$plan")

    // result identical to the plain shuffled join
    val expect = orders.join(customer,
      orders("o_custkey") === customer("c_custkey"))
    assert(joined.count() == expect.count())
    val a = joined.select("o_orderkey", "c_name").collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    val b = expect.select("o_orderkey", "c_name").collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(a == b)
  }

  test("aggregation on the bucket key also skips the shuffle") {
    val bo = Buckets.readBucketed(spark, "b_orders")
    val agg = bo.groupBy("o_custkey").agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed aggregation must not shuffle:\n$plan")
    assert(agg.count() > 0)
  }
}
