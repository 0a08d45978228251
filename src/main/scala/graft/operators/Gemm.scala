package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ExactSumFunctions

/** General distributed dense GEMM on block-partitioned matrices — the
  * reference's 2-D block-cyclic ScaLAPACK path re-expressed as Spark
  * relational algebra (reference: src/distributed-pass.jl:489-610,
  * `__hpat_gemm_2d`, BLOCK_SIZE=128 block-cyclic at src/HPAT.jl:94; the
  * reference ships that path disabled in its own CI,
  * test/runtests.jl:42-43).
  *
  * Layout: a matrix is a DataFrame of dense square blocks
  * `(bi int, bj int, m array<double>)`, `m` row-major `bs×bs`. This IS
  * the 2-D distribution: Spark hash-partitions blocks by (bi, bj), so
  * an n×n matrix spreads over the cluster in O(n²/bs²) units with no
  * driver-resident state — the Spark analog of the block-cyclic
  * ScaLAPACK grid (cyclicity itself is pointless under hash
  * partitioning, which already load-balances block coordinates).
  *
  * Multiply is the standard SUMMA-shaped plan, as a join + aggregate so
  * Catalyst owns the physical strategy:
  *   - equi-join A-blocks to B-blocks on the inner block index
  *     (A.bj = B.bi): each side is shuffled ONCE on one key — the
  *     replication that a broadcast-SUMMA would do per step rides in
  *     the join's hash exchange;
  *   - per pair, a local bs³ kernel (tight double loop — at bs=128
  *     that's the BLAS-3 granularity the reference uses);
  *   - partial C-blocks combine under `groupBy (A.bi, B.bj)` with the
  *     exact-decimal whole-vector sum, so the result is independent of
  *     the reduction order AND map-side partial aggregation keeps the
  *     final shuffle at O(#C-blocks × partitions), not O(#pairs).
  *
  * At 100 TB scale the shuffle volume is 2·|A|+|B| block bytes for the
  * join plus partial-aggregated C — the minimum any one-pass
  * distributed GEMM moves without replicating a side; when one operand
  * fits in memory Catalyst/AQE picks a broadcast join and the big side
  * is never shuffled at all.
  */
object Gemm {

  /** COO (i, j, v) → dense `bs×bs` blocks (bi, bj, m). Absent cells are
    * 0; duplicate (i, j) entries are a data error (the scatter throws).
    * Indices are 0-based. One shuffle, keyed by block coordinate. */
  def toBlocks(coo: DataFrame, bs: Int,
               i: String = "i", j: String = "j",
               v: String = "v"): DataFrame = {
    // One-pass scatter of the collected (pos, val) entries into the
    // dense block (duplicate (i,j) entries are a data error). A
    // map_from_entries + per-cell element_at assembly is O(bs⁴) per
    // block in interpreted lookups — measurably the dominant cost.
    val scatter = udf((entries: Seq[org.apache.spark.sql.Row]) => {
      val out = new Array[Double](bs * bs)
      val seen = new Array[Boolean](bs * bs)
      entries.foreach { r =>
        val p = r.getInt(0)
        if (seen(p)) throw new IllegalArgumentException(
          s"duplicate COO entry at block position $p")
        seen(p) = true
        out(p) = r.getDouble(1)
      }
      out
    })
    val pos = ((col(i) % bs) * bs + (col(j) % bs)).cast("int")
    coo
      .select(
        (col(i).cast("long") / bs).cast("int").as("bi"),
        (col(j).cast("long") / bs).cast("int").as("bj"),
        pos.as("pos"), col(v).cast("double").as("val"))
      .groupBy("bi", "bj")
      .agg(collect_list(struct(col("pos"), col("val"))).as("e"))
      .select(col("bi"), col("bj"), scatter(col("e")).as("m"))
  }

  /** Blocks (bi, bj, m) → COO (i, j, v), all `bs²` cells per block
    * (dense within covered blocks). Narrow — no shuffle. */
  def blocksToCoo(blocks: DataFrame, bs: Int): DataFrame =
    blocks
      .select(col("bi"), col("bj"), posexplode(col("m")).as(Seq("pos", "v")))
      .select(
        (col("bi").cast("long") * bs + (col("pos") / bs).cast("long")).as("i"),
        (col("bj").cast("long") * bs + col("pos") % bs).as("j"),
        col("v"))

  /** C = A·B on block DataFrames (same `bs` both sides). The local
    * bs³ kernel runs in double (each partial C-block is a
    * deterministic function of its two operand blocks); the cross-pair
    * combine is the exact-decimal vector sum, so C is bit-identical
    * under any partitioning of the inner dimension. */
  def multiplyBlocked(a: DataFrame, b: DataFrame, bs: Int): DataFrame = {
    a.as("a").join(b.as("b"), col("a.bj") === col("b.bi"))
      .select(col("a.bi").as("bi"), col("b.bj").as("bj"),
        graft.functions.VectorFunctions
          .blockMultiply(col("a.m"), col("b.m"), bs).as("p"))
      .groupBy("bi", "bj")
      .agg(ExactSumFunctions.exactVectorSum(col("p")).as("m"))
  }

  /** Gram matrix `XᵀX` of an `array<numeric>` feature column (`dim`
    * known, `bs | dim`) — the reference's `points·pointsʼ` gemm-reduce
    * pattern (src/distributed-pass.jl:699-820) done blockwise. Each row
    * contributes its rank-1 outer product split into (dim/bs)² blocks;
    * blocks combine with the exact vector sum. Every multiplication is
    * a single correctly-rounded double product (no local dot
    * accumulation), so the result equals
    * `SUM(CAST(x[i]*x[j] AS DECIMAL(27,18)))` per cell bit-for-bit
    * under Spark's cast semantics, and is partition-order-free.
    * (Cross-engine caveat: DuckDB's double→decimal cast rounds the
    * binary value where Java rounds the shortest decimal repr, so the
    * 18th fractional digit of individual products can differ — oracle
    * compares round to 6dp, like every decimal-sum oracle here.)
    *
    * Plan shape: explode to (dim/bs)² block rows per input row (still
    * the scan stage), partial ObjectHashAggregate map-side, one
    * shuffle of (dim/bs)² × partitions pre-aggregated block rows —
    * the allreduce topology; nothing driver-side. Returns (i, j, val),
    * the full dense dim×dim result. */
  def gram(df: DataFrame, features: String, dim: Int, bs: Int): DataFrame = {
    require(dim % bs == 0, s"bs=$bs must divide dim=$dim")
    val nb = dim / bs
    val x = col(features).cast("array<double>")
    // native codegen'd per-block outer product (same IEEE multiplies
    // as the slice+transform HOF form, minus its per-element
    // interpreted lambda dispatch)
    val blockRows = for { bi <- 0 until nb; bj <- 0 until nb }
      yield struct(lit(bi).as("bi"), lit(bj).as("bj"),
        graft.functions.VectorFunctions.outerBlock(col("x"), bi, bj, bs)
          .as("p"))
    // Spread rows to all cores before the O(dim²)-per-row projection:
    // a small single-split input would otherwise run the entire
    // outer-product + partial-aggregate stage on one task (at 100 TB
    // the scan has ample splits and this is a cheap row-level
    // round-robin of the narrow feature column).
    Frames.spread(df).select(x.as("x"))
      .select(explode(array(blockRows: _*)).as("b"))
      .select(col("b.bi").as("bi"), col("b.bj").as("bj"), col("b.p").as("p"))
      .groupBy("bi", "bj")
      .agg(ExactSumFunctions.exactVectorSum(col("p")).as("m"))
      .select(col("bi"), col("bj"), posexplode(col("m")).as(Seq("pos", "v")))
      .select(
        (col("bi") * bs + (col("pos") / bs).cast("int")).as("i"),
        (col("bj") * bs + col("pos") % bs).as("j"),
        col("v").as("val"))
  }
}
