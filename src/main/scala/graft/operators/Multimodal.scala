package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The Spark-side architecture is real and tested — schema, partitioning,
  * batch iteration shape (`mapPartitions` over rows, the JVM analog of
  * arrow-batched `mapInPandas`), explode plumbing for frame sampling —
  * while the actual codec calls are STUBBED with deterministic fakes
  * (`fakeDecode`): image/audio libraries are not available in this
  * environment. Swapping a real decoder in changes only the function
  * body marked STUB below; every schema and plan shape stays identical.
  *
  * Scale notes: media bytes are the dominant payload — all transforms
  * here are narrow (no shuffle); feature extraction prunes the bytes
  * column as early as possible so downstream stages shuffle only
  * fixed-size feature vectors, never blobs.
  */
object Multimodal {

  /** media-table schema: (id, modality, bytes, meta{width,height,
    * channels, sample_rate, n_frames}). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true))))))

  /** Wrap any (id, string-payload) table as a media table — the fixture
    * adapter (documents.text stands in for an encoded payload). */
  def asMedia(df: DataFrame, id: String, payload: String,
              modality: String): DataFrame =
    df.select(
      col(id).cast("long").as("media_id"),
      lit(modality).as("modality"),
      col(payload).cast("binary").as("bytes"),
      struct(
        (length(col(payload)) % 640 + 1).cast("int").as("width"),
        (length(col(payload)) % 480 + 1).cast("int").as("height"),
        lit(3).as("channels"),
        lit(16000).as("sample_rate"),
        (length(col(payload)) % 16 + 1).cast("int").as("n_frames")).as("meta"))

  /** STUB decoder: deterministic fake "pixel decode" — a keyed rolling
    * hash of the payload bytes expanded to `dim` floats in [-1, 1).
    * A real implementation would decode the image/audio codec here;
    * everything around it (batching, schema, pruning) is production
    * shape. */
  private[operators] def fakeDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L // ??? real codec goes here — STUB
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    var j = 0
    while (j < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(j) = ((h >>> 40).toInt.toFloat / (1 << 23).toFloat) - 1.0f
      j += 1
    }
    out
  }

  /** Feature extraction: bytes → fixed-`dim` float vector. A typed
    * Scala UDF inside one narrow projection: the plan stays in Tungsten
    * (no `DeserializeToObject`/RDD round-trip — the kernel is invoked
    * from generated code on UnsafeRow data). The bytes column is
    * dropped in the same projection, so the blob never crosses a stage
    * boundary. */
  def extractFeatures(media: DataFrame, dim: Int): DataFrame = {
    val decode = udf((bytes: Array[Byte]) => fakeDecode(bytes, dim))
    media.select(col("media_id"), col("modality"),
      decode(col("bytes")).as("feature"))
  }

  /** Resize: metadata-level transform (STUB payload op — a real impl
    * re-encodes pixels; the fake truncates bytes to at most w·h·channels
    * so payload size tracks the declared shape). Narrow, one
    * projection. */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val target = w * h * 3
    media.withColumn("meta",
      struct(lit(w).as("width"), lit(h).as("height"),
        col("meta.channels").as("channels"),
        col("meta.sample_rate").as("sample_rate"),
        col("meta.n_frames").as("n_frames")))
      .withColumn("bytes",
        col("bytes").substr(lit(1), least(length(col("bytes")), lit(target))))
  }

  /** Frame sampling for video-like payloads: split bytes into
    * meta.n_frames equal chunks, emit every `stride`-th as its own row
    * (media_id, frame_idx, frame_bytes). Pure explode plumbing — one
    * narrow stage. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    val n = col("meta.n_frames")
    // Integer division (SQL '/' is double division; truncating i*len
    // separately would drift chunk boundaries when length % n != 0).
    val frameLen =
      greatest(floor(length(col("bytes")) / n).cast("int"), lit(1))
    media
      .select(col("media_id"), col("bytes"), n.as("nf"), frameLen.as("fl"))
      .select(col("media_id"),
        posexplode(transform(sequence(lit(0), col("nf") - 1),
          i => substring_index_bytes(col("bytes"), i, col("fl"))))
          .as(Seq("frame_idx", "frame_bytes")))
      .filter(col("frame_idx") % stride === 0)
  }

  /** Byte-slice helper: frame i of (integer) length `len` from a binary
    * column — all-int arithmetic, so chunk boundaries are exact. */
  private def substring_index_bytes(bytes: org.apache.spark.sql.Column,
                                    i: org.apache.spark.sql.Column,
                                    len: org.apache.spark.sql.Column) =
    bytes.substr(i * len + 1, len)

  /** Perceptual hash over the (stub-)decoded signal: 64 samples from
    * the same keyed-LCG decode as [[fakeDecode]], one bit per sample —
    * set iff the sample exceeds the mean (the classic pHash/blockhash
    * shape: decode → fixed projection → threshold against the global
    * mean). Deterministic mod-2⁶⁴ arithmetic throughout, so the DuckDB
    * oracle reproduces every bit (LCG states in closed form with baked
    * per-step constants). A real implementation swaps the decode for
    * pixels + DCT; the threshold/bit packing and everything downstream
    * is production shape. */
  private[graft] def phash64(bytes: Array[Byte]): Long = {
    var h = 1125899906842597L // ??? real codec goes here — STUB
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    val v = new Array[Float](64)
    var j = 0
    while (j < 64) {
      h = h * 6364136223846793005L + 1442695040888963407L
      v(j) = ((h >>> 40).toInt.toFloat / (1 << 23).toFloat) - 1.0f
      j += 1
    }
    var s = 0.0
    j = 0; while (j < 64) { s += v(j); j += 1 }
    val m = s / 64.0
    var out = 0L
    j = 0; while (j < 64) { if (v(j) > m) out |= (1L << j); j += 1 }
    out
  }

  /** Image near-dup detection by perceptual hash: pairs of media whose
    * 64-bit pHashes differ in at most `maxHamming` ≤ 3 bits.
    *
    * Scale shape: hashes are 8 bytes per media — the blob never leaves
    * its scan stage. Exact-equal hashes collapse FIRST (one groupBy;
    * identical media — the overwhelming dup mode — costs linear work
    * and kills the banding skew a hot constant image would cause).
    * Near pairs then band the DISTINCT hashes 4×16 bits (pigeonhole:
    * ≤ 3 flipped bits leave one chunk intact, so recall is exact, not
    * probabilistic), bucket-join, and verify with bit_count(xor).
    *
    * Returns (id_a, id_b, dist): dist 0 rows pair each identical-hash
    * member with its min-id representative (linear in group size, not
    * quadratic); dist ≥ 1 rows pair the representatives of two distinct
    * hashes. */
  def phashDedup(media: DataFrame, maxHamming: Int = 3): DataFrame = {
    val ph = udf((b: Array[Byte]) => phash64(b))
    hashPairs(
      media.select(col("media_id"), ph(col("bytes")).as("h")), maxHamming)
  }

  /** The banding/verify stage of [[phashDedup]] over precomputed
    * (media_id, h) hashes — split out so the pigeonhole-recall
    * guarantee is testable with crafted hashes (the stub decoder has
    * full avalanche, so organic near-but-unequal pairs can't occur). */
  private[graft] def hashPairs(hashes: DataFrame,
                               maxHamming: Int): DataFrame = {
    require(maxHamming >= 1 && maxHamming <= 3,
      "4x16 banding guarantees recall only for maxHamming <= 3")
    val groups = hashes.groupBy(col("h")).agg(min(col("media_id")).as("rep"))
    val identical = hashes.join(groups, "h")
      .filter(col("media_id") =!= col("rep"))
      .select(col("rep").as("id_a"), col("media_id").as("id_b"),
        lit(0).as("dist"))
    val chunks = groups.select(col("h"), col("rep"),
        explode(sequence(lit(0), lit(3))).as("ci"))
      .select(col("h"), col("rep"), col("ci"),
        expr("shiftrightunsigned(h, ci * 16) & 65535").as("cv"))
    val near = chunks.as("a")
      .join(chunks.as("b"),
        col("a.ci") === col("b.ci") && col("a.cv") === col("b.cv") &&
          col("a.rep") < col("b.rep"))
      .select(col("a.rep").as("id_a"), col("b.rep").as("id_b"),
        expr("bit_count(a.h ^ b.h)").as("dist"))
      .distinct()
      .filter(col("dist") <= maxHamming)
    identical.unionByName(near)
  }
}
