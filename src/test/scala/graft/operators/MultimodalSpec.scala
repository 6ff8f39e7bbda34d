package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq((1L, "hello"), (2L, ""), (3L, "a longer payload body"))
    .toDF("doc_id", "text")

  test("extractMeta derives deterministic typed metadata from opaque bytes") {
    val out = Multimodal.extractMeta(
      Multimodal.withPayload(docs, "text"), "doc_id", "payload")
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(5L, 0L, 21L)) // n_bytes
    val r1 = out(0)
    val fp = r1.getLong(2)
    assert(fp > 0 && fp < 1000000007L)
    assert(Seq("png", "jpeg", "wav").contains(r1.getString(3)))
    assert(r1.getLong(4) == 16L + fp % 480)                 // width
    assert(r1.getLong(5) == 16L + (fp / 480) % 270)         // height
    assert(r1.getLong(6) == r1.getLong(4) * r1.getLong(5))  // n_pixels
    // same bytes → same metadata (content-addressed determinism)
    val again = Multimodal.extractMeta(
      Multimodal.withPayload(docs, "text"), "doc_id", "payload")
      .orderBy("doc_id").collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("decodeFeatures computes byte statistics per row via mapPartitions") {
    val out = Multimodal.decodeFeatures(
      Multimodal.withPayload(docs, "text"), "doc_id", "payload")
      .orderBy("id").collect()
    val h = out(0)
    val bytes = "hello".getBytes("UTF-8").map(_ & 0xff)
    val mean = bytes.sum.toDouble / bytes.length
    assert(h.getLong(1) == 5L)
    assert(math.abs(h.getDouble(2) - mean) < 1e-9)
    val empty = out(1)
    assert(empty.getLong(1) == 0L && empty.getDouble(2) == 0.0 && empty.getDouble(3) == 0.0)
  }
}
