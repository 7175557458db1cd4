package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val assets = Seq(
    (1L, "hello world"), (2L, ""), (3L, "a much longer payload for the decoder"),
  ).toDF("asset_id", "payload_text")
    .withColumn("media", encode($"payload_text", "UTF-8"))

  test("withDecodedMeta attaches typed metadata per asset") {
    val out = Multimodal.withDecodedMeta(assets, "media")
    val rows = out.select("asset_id", "media_meta.n_bytes", "media_meta.valid",
        "media_meta.width")
      .orderBy("asset_id").collect()
    assert(rows(0).getLong(1) == 11L && rows(0).getBoolean(2))
    assert(!rows(1).getBoolean(2)) // empty payload -> invalid
    assert(rows(2).getLong(1) == 37L)
    assert(rows(0).getInt(3) == 64 + 11 % 576)
  }

  test("decode is deterministic across runs") {
    val a = Multimodal.withDecodedMeta(assets, "media").select("media_meta").collect()
    val b = Multimodal.withDecodedMeta(assets, "media").select("media_meta").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("sampleFrames explodes sampled frame indices") {
    val out = Multimodal.sampleFrames(
      Multimodal.withDecodedMeta(assets, "media"), "media_meta", stride = 5)
    val byAsset = out.groupBy("asset_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // asset 1: n_frames = 1 + 11 % 29 = 12 -> frames 0,5,10 -> 3 rows
    assert(byAsset(1L) == 3L)
    // empty asset: n_frames 0 -> still one row (frame 0)
    assert(byAsset(2L) == 1L)
  }

  test("repartitionByBytes sizes partitions by media bytes") {
    val out = Multimodal.repartitionByBytes(assets, "media", targetBytes = 20L)
    assert(out.rdd.getNumPartitions == 2) // 48 bytes total / 20
    assert(out.count() == 3)
  }
}
