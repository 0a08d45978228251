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
}
