package graft.streaming

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming approximate count-distinct — the online form of
  * [[graft.operators.Sketch.approxCountDistinct]]: per group, a
  * 64-byte HLL register array held in `mapGroupsWithState`, updated
  * per micro-batch, emitting the running estimate. The register
  * derivation (md5 → bucket, rank) and the estimate arithmetic are
  * bit-for-bit the ones the batch/SQL sketch computes, so the batch
  * execution of this operator hash-matches the same DuckDB mirror —
  * and a stream that has seen the same keys reports the exact same
  * estimate (HLL merge is an idempotent max: arrival order and
  * batching cannot change the state).
  *
  * Scale design: state per group is 64 bytes, forever — the whole
  * point of HLL over a stream; no TTL is needed because the state
  * does not grow with keys. Updates are per-partition pre-reduced by
  * Spark's groupByKey shuffle of (group, key) pairs.
  */
object StreamSketch {

  case class Estimate(g: String, n_approx: Double)
  case class Regs(m: Array[Byte])

  /** JVM mirror of [[graft.operators.Sketch.bucket]]/`rho`: lowercase
    * hex md5 of the key's string form; bucket = first two hex digits
    * mod 64; rank = 61 − bit-length of the next 15 hex digits. */
  private[streaming] def bucketRho(key: String): (Int, Int) = {
    val d = MessageDigest.getInstance("MD5")
      .digest(key.getBytes(StandardCharsets.UTF_8))
    val bucket = (d(0) & 0xff) % 64
    var v = 0L
    var j = 0
    while (j < 15) { // nibbles 2..16 of the digest
      val nib = 2 + j
      val b = d(nib / 2) & 0xff
      val nibble = if (nib % 2 == 0) b >> 4 else b & 0xf
      v = (v << 4) | nibble
      j += 1
    }
    val bitLen = 64 - java.lang.Long.numberOfLeadingZeros(v)
    (bucket, 61 - bitLen)
  }

  /** JVM mirror of the batch estimate: exact integer harmonic sum in
    * BigInteger, the same double op sequence, rounded half-up to 3 dp
    * (== Spark's round(col, 3)). */
  private[streaming] def estimate(regs: Array[Byte]): Double = {
    var s = java.math.BigInteger.ZERO
    var j = 0
    while (j < 64) {
      s = s.add(java.math.BigInteger.ONE.shiftLeft(64 - regs(j)))
      j += 1
    }
    val scaleD = new java.math.BigDecimal(
      java.math.BigInteger.ONE.shiftLeft(64)).doubleValue
    val sD = new java.math.BigDecimal(s).doubleValue
    val raw = 0.709 * 64.0 * 64.0 * scaleD / sD
    val v = regs.count(_ == 0).toDouble
    // same small-range correction as the batch/SQL forms
    val est =
      if (raw <= 2.5 * 64 && v > 0) 64.0 * math.log(64.0 / v) else raw
    new java.math.BigDecimal(est)
      .setScale(3, java.math.RoundingMode.HALF_UP).doubleValue
  }

  private def core(ds: Dataset[(String, String)]): Dataset[Estimate] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_._1)
      .mapGroupsWithState[Regs, Estimate](GroupStateTimeout.NoTimeout()) {
        (g: String, rows: Iterator[(String, String)],
         state: GroupState[Regs]) =>
          val regs =
            if (state.exists) state.get.m.clone() else new Array[Byte](64)
          rows.foreach { r =>
            val (b, rho) = bucketRho(r._2)
            if (rho > regs(b)) regs(b) = rho.toByte
          }
          state.update(Regs(regs))
          Estimate(g, estimate(regs))
      }
  }

  /** Batch form: per-group estimate over a bounded frame — identical
    * numbers to [[graft.operators.Sketch.approxCountDistinct]]. */
  def approxDistinct(df: DataFrame, group: Column, key: Column,
                     groupOut: String = "g",
                     out: String = "n_approx"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    core(df.select(group.cast("string"), key.cast("string"))
      .as[(String, String)])
      .toDF(groupOut, out)
  }

  /** Streaming form: running estimate per group, updated each
    * micro-batch (use OutputMode.Update). */
  def approxDistinctStream(ds: Dataset[(String, String)]): Dataset[Estimate] =
    core(ds)

  /** Sub-sharded form — the 1000-executor topology. Keying state on
    * the group alone caps the stateful stage's parallelism at the
    * group COUNT (the sf0.1 stream audit: 5 event types ⇒ at most 5
    * tasks however large the corpus). HLL registers max-merge
    * exactly, so the state key sub-shards to (group, hash(key) %
    * shards): the heavy stage scales with group·shards, and the merge
    * — `shards` 64-byte rows per group, max per register — reproduces
    * the unsharded registers BIT-FOR-BIT (register b of the merged
    * array = max rho over all keys, regardless of which shard saw
    * which key). Same numbers, same oracle; StreamingSpec pins the
    * equality. In a live stream the merge runs as a stateless
    * per-micro-batch aggregate downstream of the stateful stage. */
  def approxDistinctSharded(df: DataFrame, group: Column, key: Column,
                            shards: Int,
                            groupOut: String = "g",
                            out: String = "n_approx"): DataFrame = {
    require(shards >= 1, "shards must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val perShard = df.select(group.cast("string"), key.cast("string"))
      .as[(String, String)]
      .groupByKey(t => (t._1, math.floorMod(t._2.hashCode, shards)))
      .mapGroupsWithState[Regs, (String, Array[Byte])](
        GroupStateTimeout.NoTimeout()) {
        (gk: (String, Int), rows: Iterator[(String, String)],
         state: GroupState[Regs]) =>
          val regs =
            if (state.exists) state.get.m.clone() else new Array[Byte](64)
          rows.foreach { r =>
            val (b, rho) = bucketRho(r._2)
            if (rho > regs(b)) regs(b) = rho.toByte
          }
          state.update(Regs(regs))
          (gk._1, regs)
      }
    perShard.groupByKey(_._1).mapGroups { (g, it) =>
      val m = new Array[Byte](64)
      it.foreach { case (_, r) =>
        var j = 0
        while (j < 64) { if (r(j) > m(j)) m(j) = r(j); j += 1 }
      }
      Estimate(g, estimate(m))
    }.toDF(groupOut, out)
  }
}
