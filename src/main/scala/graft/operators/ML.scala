package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ML kernel bridge — the reference's library surface re-expressed on
  * spark.ml plus closed-form / iterative dataflow variants.
  *
  * Reference surface (/root/reference/src/api.jl:6,32-55):
  * `Kmeans(points, k, iters)`, `LinearRegression(points, responses)`,
  * `NaiveBayes(points, responses, classes)`; DistributedPass swaps in
  * Intel DAAL distributed kernels (partial results gathered to rank 0,
  * model broadcast back — src/cgen-hpat-pattern-match-daal.jl:28-471).
  * spark.ml's implementations have the same partial/merge topology
  * (treeAggregate of sufficient statistics → driver solve → broadcast),
  * so the bridge is a thin feature-column adapter.
  *
  * `transposeHcat` replaces the reference's `__hpat_transpose_hcat`
  * fusion (src/domain-pass.jl:590-617): instead of materializing a D×N
  * matrix, rows carry an array<double> feature vector — no transpose
  * ever exists.
  */
object ML {

  /** `transpose(hcat(cols...))` — N scalar columns to one feature array
    * per row (the reference's matrix-build,
    * test/tables_transpose_hcat.jl:20). */
  def transposeHcat(df: DataFrame, cols: Seq[String], out: String): DataFrame =
    df.withColumn(out, array(cols.map(c => col(c).cast("double")): _*))

  private def toVec(arr: Column): Column =
    org.apache.spark.ml.functions.array_to_vector(arr.cast("array<double>"))

  /** `Kmeans(points, k, iters)` → (cluster, size, centroid). Seeded and
    * deterministic for a fixed input. */
  def kmeans(df: DataFrame, features: String, k: Int, iters: Int,
             seed: Long = 42L): DataFrame = {
    val spark = df.sparkSession
    val fv = df.withColumn("__fv", toVec(col(features)))
    // Random init: the reference's DAAL bridge seeds from the first
    // local rows (no k-means|| equivalent), and the parallel init alone
    // schedules more jobs than `iters` lloyd steps.
    val model = new org.apache.spark.ml.clustering.KMeans()
      .setK(k).setMaxIter(iters).setSeed(seed).setInitMode("random")
      .setFeaturesCol("__fv")
      .fit(fv)
    val sizes = model.transform(fv)
      .groupBy(col(model.getPredictionCol).as("cluster"))
      .agg(count(lit(1)).as("size"))
    val centroids = spark.createDataFrame(
      model.clusterCenters.zipWithIndex.toSeq
        .map { case (c, i) => (i, c.toArray) }).toDF("cluster", "centroid")
    sizes.join(centroids, "cluster")
  }

  /** Engine-native distributed Lloyd k-means — the same partial/merge
    * topology the reference's DAAL bridge generates (local partials →
    * gather → master update → broadcast,
    * src/cgen-hpat-pattern-match-daal.jl:28-471) expressed as pure
    * DataFrame ops, with no opaque library:
    *  - init: the k rows with the smallest `id` (deterministic, like
    *    the DAAL bridge seeding from the first local rows);
    *  - assign: k-way broadcast join + native codegen'd
    *    [[graft.functions.SquaredDistance]], argmin via min_by with a
    *    (dist, cell) tiebreak — fully whole-stage-codegen;
    *  - update: posexplode to (cell, dim, value) and one hash
    *    aggregate — map-side partial sums, the shuffle carries
    *    k·dim·partitions rows; new centroids (k·dim doubles) return to
    *    the driver and re-enter as the next broadcast (the allreduce
    *    shape, SURVEY §3 entry point 3).
    * Deterministic for a fixed input. Returns (cluster, size,
    * centroid). */
  def kmeansLloyd(df: DataFrame, features: String, id: String,
                  k: Int, iters: Int): DataFrame = {
    val spark = df.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val data = df.select(col(id).as("__id"),
      col(features).cast("array<double>").as("x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    var centroids = data.orderBy(col("__id")).limit(k)
      .collect().map(_.getSeq[Double](1).toArray)
    // assignment = ONE narrow codegen'd projection (the native
    // NearestCell kernel carries the centroid matrix in the codegen
    // references array — no join, no explode, one compile for all
    // iterations)
    def assigned(cs: Array[Array[Double]]) = data
      .withColumn("cell",
        graft.functions.VectorFunctions.nearestCell(col("x"), cs))

    for (_ <- 1 to iters) {
      // Exact-decimal component sums (the olsExact trick): the update
      // is then independent of partition/summation order, so the whole
      // 5-iteration run is bit-reproducible and DuckDB-oracle-checkable
      // (q_ml_kmeans_native unrolls these iterations as CTEs). The
      // whole-vector native aggregate ([[graft.functions
      // .VectorExactSum]], same per-element decimal(27,18) rounding in
      // 128-bit fixed point) sums all dims in one pass — no
      // |rows|·dim posexplode, and the shuffle carries one 2·dim-long
      // row per cell per partition.
      val sums = assigned(centroids)
        .groupBy(col("cell"))
        .agg(graft.functions.ExactSumFunctions.exactVectorSum(col("x")).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val byCell = sums.map(r => r.getInt(0) -> r).toMap
      centroids = centroids.indices.map { cell =>
        byCell.get(cell) match {
          case Some(r) =>
            val n = r.getLong(2)
            r.getSeq[Double](1).map(_ / n).toArray
          case None => centroids(cell) // empty cell keeps its centroid
        }
      }.toArray
    }
    val out = assigned(centroids)
      .groupBy(col("cell").as("cluster"))
      .agg(count(lit(1)).as("size"))
    val cent = spark.createDataFrame(
      spark.sparkContext.parallelize(
        centroids.toSeq.zipWithIndex.map { case (c, i) => Row(i, c.toSeq) }, 1),
      StructType(Seq(StructField("cluster", IntegerType, nullable = false),
        StructField("centroid", ArrayType(DoubleType, containsNull = false)))))
    // k-row result: materialize it as an eager localCheckpoint (no
    // CacheManager entry to leak or plan-match onto — the same
    // lifecycle the dedup pipelines use), then blocking-drop the big
    // staging cache. Left join from the centroid side so an empty cell
    // survives with size 0 — consumers (e.g. the IVF index build)
    // always see a dense 0..k-1 cluster set. Callers' legacy
    // `unpersist()` calls on the result are harmless no-ops.
    val res = cent.join(out, Seq("cluster"), "left")
      .select(col("cluster"), coalesce(col("size"), lit(0L)).as("size"),
        col("centroid"))
      .localCheckpoint(true)
    data.unpersist(true)
    res
  }

  /** `LinearRegression(points, responses)` via spark.ml (normal-equation
    * solver: one pass of sufficient statistics, driver-side solve —
    * the DAAL topology). Returns one row: (coefficients, intercept). */
  def linearRegression(df: DataFrame, features: String, label: String): DataFrame = {
    val spark = df.sparkSession
    val fv = df.withColumn("__fv", toVec(col(features)))
    val m = new org.apache.spark.ml.regression.LinearRegression()
      .setSolver("normal").setFeaturesCol("__fv").setLabelCol(label)
      .fit(fv)
    spark.createDataFrame(Seq((m.coefficients.toArray, m.intercept)))
      .toDF("coefficients", "intercept")
  }

  /** Closed-form single-feature OLS from EXACT decimal sufficient
    * statistics — deterministic and oracle-checkable (summation-order
    * independent), unlike any float solver. slope/intercept by the
    * textbook formula; one distributed aggregate, driver does two
    * divisions. */
  def olsExact(df: DataFrame, x: Column, y: Column): DataFrame = {
    val xd = x.cast("decimal(18,4)")
    val yd = y.cast("decimal(18,4)")
    val cc = df.filter(x.isNotNull && y.isNotNull)
    // Exact decimal sufficient statistics, then a fixed double-op
    // sequence — mirrored verbatim in the DuckDB oracle. (Keeping the
    // n·Sxy products in decimal would overflow DuckDB's 38-digit type
    // derivation; casting the exact sums to double first is
    // deterministic on both engines.)
    cc.agg(
      count(lit(1)).cast("double").as("n"),
      sum(xd).cast("double").as("sx"), sum(yd).cast("double").as("sy"),
      sum(xd * xd).cast("double").as("sxx"),
      sum(xd * yd).cast("double").as("sxy"))
      .select(
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx"))).as("slope"),
        col("n"), col("sx"), col("sy"))
      .select(col("slope"),
        (col("sy") / col("n") - col("slope") * (col("sx") / col("n")))
          .as("intercept"))
  }

  /** Per-group simple linear regression — "many small models in one
    * pass". Same exact-decimal sufficient statistics as [[olsExact]]
    * but grouped: each group's entire state is five numbers, folded by
    * ONE partial-aggregated hash shuffle, so a million groups cost the
    * same plan as one (no per-group iteration, no per-group task, no
    * driver loop — the degenerate-but-common "fit a model per segment"
    * workload that tempts people into collect()-and-loop). Groups with
    * zero x-variance yield null slope/intercept (0/0), surfaced rather
    * than masked. Returns (group, n, slope, intercept). */
  def olsByGroup(df: DataFrame, grp: Column, x: Column,
                 y: Column): DataFrame = {
    val xd = x.cast("decimal(18,4)")
    val yd = y.cast("decimal(18,4)")
    // Complete cases only: an unfiltered count(*) would disagree with
    // the null-skipping sums and silently bias every group's fit.
    df.filter(x.isNotNull && y.isNotNull).groupBy(grp)
      .agg(
        count(lit(1)).cast("double").as("__n"),
        sum(xd).cast("double").as("__sx"), sum(yd).cast("double").as("__sy"),
        sum(xd * xd).cast("double").as("__sxx"),
        sum(xd * yd).cast("double").as("__sxy"))
      .withColumn("__den",
        col("__n") * col("__sxx") - col("__sx") * col("__sx"))
      .withColumn("slope", when(col("__den") === 0.0, lit(null))
        .otherwise((col("__n") * col("__sxy") -
          col("__sx") * col("__sy")) / col("__den")))
      .withColumn("intercept",
        col("__sy") / col("__n") - col("slope") * (col("__sx") / col("__n")))
      .withColumn("n", col("__n").cast("long"))
      .drop("__n", "__sx", "__sy", "__sxx", "__sxy", "__den")
  }

  /** `NaiveBayes(points, responses, classes)` — Gaussian NB (features
    * may be negative, e.g. embeddings). Returns per-row predictions. */
  def naiveBayes(df: DataFrame, features: String, label: String,
                 id: String): DataFrame = {
    val fv = df.withColumn("__fv", toVec(col(features)))
      .withColumn("__lbl", col(label).cast("double"))
    val m = new org.apache.spark.ml.classification.NaiveBayes()
      .setModelType("gaussian").setFeaturesCol("__fv").setLabelCol("__lbl")
      .fit(fv)
    m.transform(fv)
      .select(col(id), col(label),
        col(m.getPredictionCol).cast("int").as("prediction"))
  }

  /** Engine-native Gaussian Naive Bayes FIT — the DAAL-bridge topology
    * (local partials → gather → master finalize) as one distributed
    * aggregate: per (class, dim), count + exact-decimal Σv and Σv² (so
    * the sufficient statistics are independent of partition/summation
    * order), then the fixed double op sequence mean = s/n,
    * var = ss/n − (s/n)², prior = n/total. Deterministic and
    * DuckDB-oracle-checkable, unlike the float-accumulating library
    * path ([[naiveBayes]], kept for the per-row prediction surface).
    * Returns (y, dim, prior, mean, variance) rounded to 6dp — the
    * variance subtraction cancels a few digits, so ulp-level agreement
    * through the cancellation is not asserted (same rationale as
    * [[olsExact]]). */
  def naiveBayesExact(df: DataFrame, features: String, label: String): DataFrame = {
    val pts = df.select(col(label).cast("int").as("y"),
      col(features).cast("array<double>").as("x"))
    val total = pts.count().toDouble // O(1) driver scalar for the prior
    // Whole-vector native exact sums (Σv, Σv² per dim in one pass,
    // no |rows|·dim explode); per-element v·v stays a double product
    // before rounding, as before.
    pts.groupBy(col("y"))
      .agg(count(lit(1)).as("n"),
        graft.functions.ExactSumFunctions.exactVectorSum(col("x")).as("sv"),
        graft.functions.ExactSumFunctions
          .exactVectorSum(transform(col("x"), v => v * v)).as("ssv"))
      .select(col("y"), col("n"),
        posexplode(arrays_zip(col("sv"), col("ssv"))).as(Seq("dim", "z")))
      .select(col("y"), col("dim"), col("n"),
        col("z.sv").as("s"), col("z.ssv").as("ss"))
      .select(col("y"), col("dim"),
        round(col("n") / lit(total), 6).as("prior"),
        round(col("s") / col("n"), 6).as("mean"),
        round(col("ss") / col("n") - (col("s") / col("n")) * (col("s") / col("n")), 6)
          .as("variance"))
  }

  /** The reference's flagship iterative pattern
    * (examples/logistic_regression.jl:35-47): batch gradient descent,
    * w replicated, one gradient-reduce per iteration. Here: features
    * stay an array column; the per-component gradient is D codegen'd
    * `sum` aggregates (Spark's treeAggregate ≈ HPAT's MPI_Allreduce);
    * w returns to the driver each step and re-enters the plan as a
    * literal (≈ broadcast). Returns final weights as one row. */
  def logisticRegression(df: DataFrame, features: String, label: String,
                         dim: Int, iters: Int, lr: Double): DataFrame = {
    val spark = df.sparkSession
    val data = df.select(col(features).cast("array<double>").as("x"),
      col(label).cast("double").as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var w = Array.fill(dim)(0.0)
    val n = data.count().toDouble
    for (_ <- 1 to iters) {
      // One codegen'd partial/final aggregate per iteration — the
      // reference's allreduce-per-iteration shape (SURVEY §3 entry
      // point 2). Weights ride in a broadcast one-row table rather than
      // as literals: the generated code is then IDENTICAL across
      // iterations (only the broadcast data changes), so Janino
      // compiles the loop body once, not `iters` times. Margin and
      // error are plain arithmetic (no interpreted HOF lambdas);
      // `err` is staged so the D gradient sums share one value.
      val wDf = spark.createDataFrame(Seq(Tuple1(w.toSeq))).toDF("__w")
      // Margin and gradient scaling are the native vector kernels
      // (graft_dot / graft_scale): the earlier unrolled
      // element_at-chains were bit-identical but ~2·dim expression
      // nodes each, and Catalyst re-analyzed/optimized those ~190-node
      // trees EVERY iteration (~0.27 s/iter of driver time at dim=64,
      // independent of data size). The kernels keep the tree O(1) —
      // same IEEE per-row arithmetic (index-order loop, 0.0 seed ≡
      // the left-associated chain), so the descent trajectory and the
      // oracle compare are unchanged.
      val margin = graft.functions.VectorFunctions.dot(col("x"), col("__w"))
      val err = (lit(1.0) / (lit(1.0) + exp(-margin)) - col("y")).as("err")
      // Per-row products stay double (deterministic per row); the
      // cross-row sum is exact decimal so the gradient — and therefore
      // the whole descent trajectory — is independent of partition
      // order and engine summation order (oracle-checkable). One
      // native whole-vector exact sum replaces D separate
      // Decimal-buffered aggregates (same per-element rounding, same
      // result bits — ExactSumSpec).
      val grad = data.crossJoin(broadcast(wDf))
        .select(col("x"), err)
        .select(graft.functions.VectorFunctions
          .scale(col("x"), col("err")).as("p"))
        .agg(graft.functions.ExactSumFunctions.exactVectorSum(col("p"))
          .as("grad"))
        .head().getSeq[Double](0)
      w = w.zip(grad).map { case (wi, gi) => wi - lr * gi / n }
    }
    data.unpersist(true)
    spark.createDataFrame(Seq(Tuple1(w.toSeq))).toDF("weights")
  }
}
