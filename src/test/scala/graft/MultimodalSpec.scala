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
}
