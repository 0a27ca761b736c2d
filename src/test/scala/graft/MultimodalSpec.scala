package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaRecord, StubDecoder}

class MultimodalSpec extends SparkSpec {

  lazy val media = Multimodal.fromDocuments(table("documents"))

  test("media table has the lake shape: binary payload + typed meta") {
    val f = media.schema("payload")
    assert(f.dataType === org.apache.spark.sql.types.BinaryType)
    val meta = media.schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq === Seq("format", "widthPx", "heightPx", "durationMs"))
    assert(media.count() === table("documents").count())
  }

  test("batched feature extraction is deterministic and complete") {
    import SparkSpec.spark.implicits._
    val ds = media.as[MediaRecord]
    val feats = Multimodal.extractFeatures(ds, StubDecoder, batchSize = 16)
    val a = feats.collect().sortBy(_.mediaId)
    val b = Multimodal.extractFeatures(ds, StubDecoder, batchSize = 7)
      .collect().sortBy(_.mediaId)
    assert(a.length === table("documents").count())
    assert(a.forall(_.features.length == 8))
    // batch size must not affect results
    assert(a.map(_.features.toSeq) === b.map(_.features.toSeq))
    // payload length == utf-8 text byte count
    val lens = table("documents")
      .select(col("doc_id"), length(col("text"))).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a.forall(f => f.nBytes === lens(f.mediaId)))
  }

  test("RealDecoder is an explicit stub") {
    intercept[NotImplementedError] {
      Multimodal.RealDecoder.decode(Array[Byte](1), null)
    }
  }

  test("frame sampling explodes every k-th fixed-size frame, streaming shape") {
    import SparkSpec.spark.implicits._
    val ds = media.as[MediaRecord].filter(_.mediaId < 20)
    val frames = Multimodal.sampleFrames(ds, frameBytes = 16, everyK = 3).collect()
    val byId = frames.groupBy(_.mediaId)
    ds.collect().foreach { r =>
      val total = (r.payload.length + 15) / 16
      val expected = (0 until total).count(_ % 3 == 0)
      assert(byId(r.mediaId).length === expected, s"media ${r.mediaId}")
      assert(byId(r.mediaId).map(_.frameIdx).sorted.toSeq
        === (0 until total).filter(_ % 3 == 0))
    }
    // every sampled frame except a tail frame is exactly frameBytes long
    frames.filter(f => f.frameIdx < (byId(f.mediaId).map(_.frameIdx).max))
      .foreach(f => assert(f.frameBytes.length === 16))
  }

  test("resize fits meta into the box and shrinks payload deterministically") {
    import SparkSpec.spark.implicits._
    val ds = media.as[MediaRecord].filter(_.mediaId < 20)
    val out1 = Multimodal.resize(ds, 128, 128).collect().sortBy(_.mediaId)
    val out2 = Multimodal.resize(ds, 128, 128).collect().sortBy(_.mediaId)
    out1.zip(out2).foreach { case (a, b) =>
      assert(a.meta === b.meta && a.payload.toSeq === b.payload.toSeq)
    }
    out1.foreach { r =>
      assert(r.meta.widthPx <= 128 && r.meta.heightPx <= 128)
      assert(r.payload.nonEmpty)
    }
    // already-small media pass through unscaled
    val orig = ds.collect().map(r => r.mediaId -> r).toMap
    out1.filter(r => orig(r.mediaId).meta.widthPx <= 128 &&
        orig(r.mediaId).meta.heightPx <= 128)
      .foreach(r => assert(r.meta === orig(r.mediaId).meta))
  }
}
