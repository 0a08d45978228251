package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Plumbing tests for multimodal columns (decode is a deterministic
  * stub; schema/batching/explode shapes are the product). */
class MultimodalSpec extends SparkSpec {

  private lazy val media = {
    import spark.implicits._
    val df = Seq((1L, "abcdefghijklmnopqrstuvwxyz0123456789"),
      (2L, "shorter payload")).toDF("doc_id", "text")
    Multimodal.asMedia(df, "doc_id", "text", "image")
  }

  test("asMedia produces the typed media schema") {
    val f = media.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(f("media_id") == "long" && f("bytes") == "binary" &&
      f("meta") == "struct")
    assert(media.count() == 2)
  }

  test("extractFeatures is deterministic, fixed-dim, and drops bytes") {
    val feats = Multimodal.extractFeatures(media, dim = 8)
    assert(!feats.columns.contains("bytes"))
    val a = feats.orderBy("media_id").collect().map(_.getSeq[Float](2))
    val b = Multimodal.extractFeatures(media, dim = 8)
      .orderBy("media_id").collect().map(_.getSeq[Float](2))
    assert(a.forall(_.length == 8))
    assert(a.map(_.toList).toSeq == b.map(_.toList).toSeq)
    assert(a(0) != a(1)) // different payloads → different features
  }

  test("extractFeatures stays in Tungsten (no RDD/object round-trip)") {
    val plan = Multimodal.extractFeatures(media, dim = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject"), plan)
    assert(!plan.contains("ExistingRDD"), plan)
    assert(!plan.contains("MapPartitions"), plan)
  }

  test("resize truncates payload to the declared shape bound") {
    val r = Multimodal.resize(media, 2, 3) // target 2*3*3 = 18 bytes
    val rows = r.orderBy("media_id").collect()
    assert(rows(0).getAs[Array[Byte]]("bytes").length == 18)
    assert(rows(1).getAs[Array[Byte]]("bytes").length == 15) // shorter kept
    assert(rows.forall(_.getStruct(3).getInt(0) == 2))
  }

  test("sampleFrames emits every stride-th chunk") {
    val frames = Multimodal.sampleFrames(media, stride = 2)
    val byId = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // n_frames = len % 16 + 1; 36 % 16 + 1 = 5 frames -> idx 0,2,4 = 3
    assert(byId(1L) == 3)
    val idx = frames.filter(col("media_id") === 1)
      .select("frame_idx").collect().map(_.getInt(0)).sorted.toSeq
    assert(idx == Seq(0, 2, 4))
  }

  test("frame chunks are contiguous and non-overlapping (int arithmetic)") {
    // 36 bytes / 5 frames → frameLen 7; offsets 0,7,14,21,28 — with
    // double division (36/5=7.2) truncated offsets would drift.
    val frames = Multimodal.sampleFrames(media, stride = 1)
      .filter(col("media_id") === 1)
      .orderBy("frame_idx").collect()
      .map(r => new String(r.getAs[Array[Byte]]("frame_bytes")))
    assert(frames.forall(_.length == 7))
    assert(frames.mkString == "abcdefghijklmnopqrstuvwxyz0123456789".take(35))
  }

  test("phash64 is deterministic and content-sensitive") {
    val a = Multimodal.phash64("an image payload".getBytes("UTF-8"))
    val b = Multimodal.phash64("an image payload".getBytes("UTF-8"))
    val c = Multimodal.phash64("another payload!".getBytes("UTF-8"))
    assert(a == b && a != c)
  }

  test("hashPairs: identical collapse is linear, banding finds <=3-bit flips") {
    import spark.implicits._
    val base = 0x0123456789ABCDEFL
    val hashes = Seq(
      1L -> base, 2L -> base, 3L -> base,      // identical group, rep=1
      4L -> (base ^ 7L),                       // 3 bits flipped → near
      5L -> (base ^ 0x8001000100010001L),      // 4 chunks touched → out
      6L -> 0x7777000011112222L                // unrelated
    ).toDF("media_id", "h")
    val got = Multimodal.hashPairs(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 2L, 0), (1L, 3L, 0), (1L, 4L, 3)))
  }
}
