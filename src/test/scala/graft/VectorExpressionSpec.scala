package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Native CosineSimilarity expression: correctness, codegen path,
  * bit-exactness vs the interpreted fold form, SQL registration. */
class VectorExpressionSpec extends SparkSpec {

  private def foldCosine(a: org.apache.spark.sql.Column,
                         b: org.apache.spark.sql.Column) = {
    def fold(arr: org.apache.spark.sql.Column) =
      aggregate(arr, lit(0.0), (s, x) => s + x)
    val dot = fold(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))
    val na = fold(transform(a, x => x.cast("double") * x.cast("double")))
    val nb = fold(transform(b, x => x.cast("double") * x.cast("double")))
    dot / sqrt(na) / sqrt(nb)
  }

  test("cosine of known vectors") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
      (Seq(1.0f, 1.0f), Seq(1.0f, 1.0f)),
      (Seq(1.0f, 0.0f), Seq(-1.0f, 0.0f))).toDF("a", "b")
    val got = df.select(VectorFunctions.cosine(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    assert(math.abs(got(0)) < 1e-15)
    assert(math.abs(got(1) - 1.0) < 1e-15)
    assert(math.abs(got(2) + 1.0) < 1e-15)
  }

  test("native expression is bit-exact vs the interpreted fold on fixtures") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .limit(100)
    val both = e.as("a").crossJoin(e.as("b")).limit(500)
      .select(
        VectorFunctions.cosine(col("a.embedding"), col("b.embedding")).as("native"),
        foldCosine(col("a.embedding"), col("b.embedding")).as("fold"))
    assert(both.filter(col("native") =!= col("fold")).count() == 0)
  }

  test("graft_cosine is registered as a SQL function via extensions") {
    import spark.implicits._
    Seq((Seq(3.0, 4.0), Seq(3.0, 4.0))).toDF("a", "b")
      .createOrReplaceTempView("vv")
    val r = spark.sql("SELECT graft_cosine(a, b) c FROM vv").head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-15)
  }

  test("OuterBlock matches the slice+transform HOF form bit-exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{flatten, slice, transform}
    val dim = 8; val bs = 4
    val df = Seq.tabulate(20)(i =>
      Tuple1(Seq.tabulate(dim)(d => math.sin(i * dim + d))))
      .toDF("x")
    for (bi <- 0 until dim / bs; bj <- 0 until dim / bs) {
      def hof = {
        val si = slice(col("x"), bi * bs + 1, bs)
        val sj = slice(col("x"), bj * bs + 1, bs)
        flatten(transform(si, xi => transform(sj, xj => xi * xj)))
      }
      val rows = df.select(
        graft.functions.VectorFunctions.outerBlock(col("x"), bi, bj, bs)
          .as("native"), hof.as("hof")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Double](0) == r.getSeq[Double](1),
          s"block ($bi,$bj)")
      }
    }
  }

  test("OuterBlock interpreted eval agrees with the codegen path") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val x = Array.tabulate(8)(d => 0.1 * d - 0.3)
    val expr = graft.functions.OuterBlock(
      BoundReference(0, ArrayType(DoubleType), nullable = false), 1, 0, 4)
    val got = expr.eval(InternalRow(new GenericArrayData(x)))
      .asInstanceOf[GenericArrayData].toDoubleArray()
    val want = for (r <- 0 until 4; c <- 0 until 4) yield x(4 + r) * x(c)
    assert(got.toSeq == want)
  }
}
