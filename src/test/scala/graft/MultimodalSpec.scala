package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

/** Multimodal plumbing: batched decode, features, frame sampling. */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark.{sf0001, spark}
  import spark.implicits._

  private lazy val media = Multimodal.mediaDataset(spark, sf0001)

  test("media table covers all documents with typed metadata") {
    val n = Tables.documents(spark, sf0001).count()
    assert(media.count() == n)
    assert(media.filter(r => !Set("image", "audio", "video").contains(r.kind)).count() == 0)
    // Videos carry duration; images carry dimensions.
    assert(media.filter(r => r.kind == "video" && r.duration_ms <= 0).count() == 0)
    assert(media.filter(r => r.kind == "image" && (r.width <= 0 || r.height <= 0)).count() == 0)
  }

  test("decode emits one row per media with the payload checksum") {
    val dec = Multimodal.decode(media)
    assert(dec.count() == media.count())
    // Spot-check one checksum against the JVM md5 of the same payload.
    val row = media.head()
    val got = dec.filter(_.media_id == row.media_id).head()
    val want = java.security.MessageDigest.getInstance("MD5")
      .digest(row.data).map("%02x".format(_)).mkString
    assert(got.checksum == want)
    assert(got.n_bytes == row.data.length)
  }

  test("features: L1-normalized 16-bin histograms") {
    val f = Multimodal.features(media)
    assert(f.filter(_.histogram.length != 16).count() == 0)
    assert(f.filter(r => math.abs(r.histogram.sum - 1.0) > 1e-9).count() == 0)
  }

  test("frame sampling explodes videos only, offsets in bounds") {
    val frames = Multimodal.sampleFrames(media)
    val videos = media.filter(_.kind == "video").collect().map(r => r.media_id -> r).toMap
    assert(frames.count() ==
      videos.values.map(v => math.max(1L, v.duration_ms / 500L)).sum)
    assert(frames.filter(f => !videos.contains(f.media_id)).count() == 0)
    val bad = frames.collect().filter { f =>
      val len = videos(f.media_id).data.length.toLong
      f.frame_off < 0 || f.frame_off >= len || f.frame_len <= 0 || f.frame_off + f.frame_len > len
    }
    assert(bad.isEmpty, s"out-of-bounds frames: ${bad.take(3).mkString(",")}")
  }
}
