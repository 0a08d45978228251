package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native codegen'd sketch kernels for the dedup pipelines.
  *
  * These replace higher-order-function compositions whose lambdas
  * Catalyst interprets per element (`transform(seq(1,k), s ->
  * array_min(transform(sh, x -> xxhash64(x, s))))` evaluates k × |sh|
  * interpreted closures and allocates k intermediate arrays per row).
  * Each kernel is one fused loop over the token array, fully inside
  * whole-stage codegen — at 100 TB these run in the scan stage, so the
  * constant factor is the difference between a CPU-bound and an
  * IO-bound dedup pass.
  */

/** MinHash signature of an array<string>: `numHashes` minima over the
  * affine hash family h_s(x) = h1(x) + s·h2(x) (two xxhash64 evals per
  * element instead of `numHashes` — Kirsch/Mitzenmacher, "Less Hashing,
  * Same Performance"). h1(x) = xxhash64(x) with Spark's default seed;
  * h2(x) = xxhash64 of the [[MinHashSignature.Seed2]] long chained onto
  * h1 — exactly what the built-in `xxhash64(x, lit(Seed2))` computes, so
  * [[graft.operators.Dedup.minhashSignatureHof]] reproduces this kernel
  * bit-for-bit from independent built-in primitives (differential test
  * in SketchExpressionSpec). Empty input yields the all-MaxValue
  * signature, so empty docs band-collide with each other exactly like
  * the HOF formulation (they are then Jaccard-verified anyway).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
  extends UnaryExpression {
  import MinHashSignature.{Seed1, Seed2}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numHashes > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> and numHashes > 0")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h1 = XXH64.hashUTF8String(s, Seed1)
        val h2 = XXH64.hashLong(Seed2, h1)
        var h = h1
        var j = 0
        while (j < numHashes) {
          h += h2
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val h2 = ctx.freshName("h2")
      val s = ctx.freshName("s")
      val mins = ctx.freshName("mins")
      s"""
         |int $n = $a.numElements();
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
         |    long $h = $xxh.hashUTF8String($s, ${Seed1}L);
         |    long $h2 = $xxh.hashLong(${Seed2}L, $h);
         |    for (int $j = 0; $j < $numHashes; $j++) {
         |      $h += $h2;
         |      if ($h < $mins[$j]) $mins[$j] = $h;
         |    }
         |  }
         |}
         |${ev.value} = new $gad($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

object MinHashSignature {
  /** Spark's fixed xxhash64 seed. */
  val Seed1 = 42L
  /** Chained-seed constant: h2 = XXH64.hashLong(Seed2, h1) ==
    * `xxhash64(x, lit(Seed2))`. */
  val Seed2 = 0x27d4eb2f165667c5L
}

/** SimHash of an array<string>, emitted as `chunks` unsigned 16-bit
  * ints (LSB chunk first) for pigeonhole banding: one xxhash64 per
  * element, ±1 votes per bit position, bit set where votes ≥ 0.
  * Matches the staged HOF formulation bit-for-bit (same per-token
  * xxhash64 seed 42, same ≥0 vote rule, same chunk order), including
  * the all-ones chunks for an empty token array.
  */
case class SimHashChunks(child: Expression, chunks: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if chunks > 0 && 64 % chunks == 0 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> and chunks dividing 64")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_simhash"

  private val bitsPerChunk = 64 / chunks

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
        var b = 0
        while (b < 64) {
          votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    val out = new Array[Int](chunks)
    var c = 0
    while (c < chunks) {
      var v = 0
      var b = 0
      while (b < bitsPerChunk) {
        if (votes(c * bitsPerChunk + b) >= 0) v |= (1 << b)
        b += 1
      }
      out(c) = v
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val c = ctx.freshName("c")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val votes = ctx.freshName("votes")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    long $h = $xxh.hashUTF8String($a.getUTF8String($i), 42L);
         |    for (int $b = 0; $b < 64; $b++) {
         |      $votes[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |}
         |int[] $out = new int[$chunks];
         |for (int $c = 0; $c < $chunks; $c++) {
         |  int $v = 0;
         |  for (int $b = 0; $b < $bitsPerChunk; $b++) {
         |    if ($votes[$c * $bitsPerChunk + $b] >= 0) $v |= (1 << $b);
         |  }
         |  $out[$c] = $v;
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): SimHashChunks =
    copy(child = c)
}

/** Static kernel for [[WinnowFingerprints]], shared by the interpreted
  * and codegen paths. */
object WinnowKernel {

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03) of
    * one normalized string: xxhash64 (Spark's default seed) of every
    * `n`-CODE-POINT gram, sliding minima over `w` consecutive gram
    * hashes (one global minimum when there are fewer than `w` grams),
    * distinct in first-occurrence order.
    *
    * Value-identical to the staged HOF formulation
    * ([[graft.operators.Dedup.winnowFingerprintsHof]]'s
    * `transform(substr) → xxhash64 → array_min(slice) → array_distinct`
    * pipeline — differential test in SketchExpressionSpec) but one
    * fused pass: gram hashes are computed straight off the string's
    * UTF-8 byte range (a UTF8String code-point substring is a
    * contiguous byte span, and `xxhash64(substr(...))` hashes exactly
    * those bytes), and the window minima come from a monotone deque —
    * O(len) total, zero per-gram allocation, where the HOF form paid a
    * substring copy per gram plus a `w`-element slice copy per window
    * position, all under interpreted lambdas. */
  def fingerprints(t: org.apache.spark.unsafe.types.UTF8String,
                   n: Int, w: Int): Array[Long] = {
    val numChars = t.numChars()
    if (numChars < n) return Array.emptyLongArray
    val g = numChars - n + 1
    val nb = t.numBytes()
    val base = t.getBaseObject
    val off = t.getBaseOffset
    // code-point index -> byte offset (the walk substringSQL does)
    val offsets = new Array[Int](numChars + 1)
    var ci = 0
    var b = 0
    while (b < nb) {
      offsets(ci) = b
      b += org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(
        org.apache.spark.unsafe.Platform.getByte(base, off + b))
      ci += 1
    }
    offsets(numChars) = nb
    val h = new Array[Long](g)
    var j = 0
    while (j < g) {
      h(j) = XXH64.hashUnsafeBytes(base, off + offsets(j),
        offsets(j + n) - offsets(j), 42L)
      j += 1
    }
    val ww = math.min(w, g) // fewer grams than the window: global min
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    val dq = new Array[Int](g) // monotone deque of indices, [head, tail)
    var head = 0
    var tail = 0
    var i = 0
    while (i < g) {
      while (tail > head && h(dq(tail - 1)) >= h(i)) tail -= 1
      dq(tail) = i
      tail += 1
      if (i >= ww - 1) {
        while (dq(head) <= i - ww) head += 1
        out.add(h(dq(head)))
      }
      i += 1
    }
    val res = new Array[Long](out.size())
    val it = out.iterator()
    var r = 0
    while (it.hasNext) { res(r) = it.next(); r += 1 }
    res
  }
}

/** Winnowing document fingerprints of a normalized string as ONE
  * codegen'd kernel: `array<long>` of distinct `w`-window gram-hash
  * minima (see [[WinnowKernel.fingerprints]]). The HOF pipeline it
  * replaces was 61 s of the 500k-doc scaling-audit corpus (interpreted
  * lambdas, per-gram substring copies, per-window slice copies); the
  * kernel is a single scan-stage pass. */
case class WinnowFingerprints(child: Expression, n: Int, w: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 && w > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input and positive n/w")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_fps"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(WinnowKernel.fingerprints(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, t =>
      s"""
         |${ev.value} = new $gad(
         |  graft.functions.WinnowKernel.fingerprints($t, $n, $w));
       """.stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): WinnowFingerprints =
    copy(child = c)
}

object SketchFunctions {
  def minhashSignature(tokens: Column, numHashes: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(tokens), numHashes))

  def simhashChunks(tokens: Column, chunks: Int = 4): Column =
    Bridge.column(SimHashChunks(Bridge.expression(tokens), chunks))

  def winnowFingerprints(text: Column, n: Int, w: Int): Column =
    Bridge.column(WinnowFingerprints(Bridge.expression(text), n, w))
}
