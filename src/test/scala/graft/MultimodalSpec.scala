package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.{DecodedMedia, MediaRow}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeBatched: stub decode is correct and batching drops nothing") {
    implicit val s = spark
    val rows = (1L to 1000L).map { i =>
      MediaRow(i, Array.fill((i % 200).toInt + 2)((i % 251).toByte), "fake/rgb8")
    }
    val decoded = Multimodal.decodeBatched(rows.toDS().repartition(7),
      batchSize = 13).collect()
    assert(decoded.length == 1000) // batch boundaries × partitions lose no rows
    val d42 = decoded.find(_.media_id == 42L).get
    assert(d42.byte_len == 44)
    assert(d42.width == 42 && d42.height == 42)
    assert(d42.n_frames == 44 / 64 + 1)
  }

  test("decodeBatched handles empty and 1-byte payloads") {
    implicit val s = spark
    val rows = Seq(MediaRow(1L, Array.emptyByteArray, "f"),
      MediaRow(2L, Array[Byte](7), "f"))
    val d = Multimodal.decodeBatched(rows.toDS()).collect()
      .map(r => r.media_id -> r).toMap
    assert(d(1L).width == 0 && d(1L).height == 0 && d(1L).byte_len == 0)
    assert(d(2L).width == 7 && d(2L).height == 0)
  }

  test("sampleFrameIndexes: stride sampling of decoded frames") {
    val decoded = Seq(DecodedMedia(1L, 640, 64, 48, 10, "fake/video"))
      .toDF()
    val idx = Multimodal.sampleFrameIndexes(decoded, stride = 3)
      .select("frame_idx").as[Int].collect().toSeq
    assert(idx == Seq(0, 3, 6, 9))
  }

  test("decodeDocumentsAsMedia runs over real testdata") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Multimodal.decodeDocumentsAsMedia(spark, docs)
    assert(out.count() == docs.count())
    assert(out.columns.toSeq == Seq("media_id", "byte_len", "width",
      "height", "n_frames", "format"))
  }
}
