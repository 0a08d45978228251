package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.hdf5.Hdf5Store

/** DataSourceV2 HDF5 container (reference
  * cgen-hpat-pattern-match.jl:849-1048/1201-1269): one 1-D dataset per
  * column, contiguous block reads, dataset-granularity pruning. The
  * chunk codec is the in-memory stub store; everything asserted here is
  * the Spark-facing contract a native libhdf5 backend would inherit.
  */
class Hdf5Spec extends SparkSpec {
  import spark.implicits._

  private val fmt = "graft.sources.hdf5"

  test("stencil_test1 fixture shape: read (userid, val2) column datasets") {
    Hdf5Store.put("mem:t1", Seq(
      "userid" -> (LongType -> IndexedSeq[Any](1L, 2L, 3L, 1L, 2L)),
      "val2" -> (DoubleType -> IndexedSeq[Any](1.2, 2.1, 3.1, 3.2, 1.9))))
    val df = spark.read.format(fmt).option("path", "mem:t1").load()
    assert(df.schema.fieldNames.toSeq == Seq("userid", "val2"))
    assert(df.count() == 5)
    assert(df.agg(sum("val2")).head.getDouble(0) == 11.5)
    Hdf5Store.drop("mem:t1")
  }

  test("column pruning reaches the source: unreferenced dataset never opened") {
    Hdf5Store.put("mem:prune", Seq(
      "a" -> (LongType -> IndexedSeq[Any](1L, 2L, 3L)),
      "b" -> (StringType -> IndexedSeq[Any]("x", "y", "z")),
      "c" -> (DoubleType -> IndexedSeq[Any](0.1, 0.2, 0.3))))
    Hdf5Store.resetOpened()
    val got = spark.read.format(fmt).option("path", "mem:prune").load()
      .select("a").agg(sum("a")).head.getLong(0)
    assert(got == 6L)
    val opened = Hdf5Store.opened.keySet
    assert(opened.exists(_.endsWith("/a")))
    assert(!opened.exists(_.endsWith("/b")), s"pruned dataset read: $opened")
    assert(!opened.exists(_.endsWith("/c")), s"pruned dataset read: $opened")
    Hdf5Store.drop("mem:prune")
  }

  test("scan splits into contiguous disjoint blocks (1-D block distribution)") {
    Hdf5Store.put("mem:blocks", Seq(
      "i" -> (LongType -> IndexedSeq.tabulate[Any](103)(_.toLong))))
    val df = spark.read.format(fmt).option("path", "mem:blocks")
      .option("partitions", "8").load()
    assert(df.rdd.getNumPartitions == 8)
    // disjoint + complete: every row exactly once, in block order
    val got = df.select("i").collect().map(_.getLong(0)).toSeq
    assert(got.sorted == (0L until 103L))
    assert(df.count() == 103)
    Hdf5Store.drop("mem:blocks")
  }

  test("write path: per-partition blocks commit in partition order; round-trip") {
    val df = (1 to 50).map(i => (i.toLong, s"d$i", i * 0.5))
      .toDF("id", "name", "v").repartition(5, col("id"))
    df.write.format(fmt).option("path", "mem:w").mode("overwrite").save()
    val back = spark.read.format(fmt).option("path", "mem:w").load()
    assert(back.schema.map(f => f.name -> f.dataType).toSeq ==
      Seq("id" -> LongType, "name" -> StringType, "v" -> DoubleType))
    assert(back.count() == 50)
    assert(back.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq == (1 to 50).map(i => (i.toLong, s"d$i")))
    // append mode extends the datasets
    (51 to 60).map(i => (i.toLong, s"d$i", i * 0.5)).toDF("id", "name", "v")
      .write.format(fmt).option("path", "mem:w").mode("append").save()
    assert(spark.read.format(fmt).option("path", "mem:w").load().count() == 60)
    Hdf5Store.drop("mem:w")
  }
}
