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

  test("frameSample chunks payloads with stride, bounded last frame") {
    val media = Seq((1L, "abcdefghij"), (2L, "xyz"), (3L, ""))
      .toDF("doc_id", "text")
    val out = Multimodal.frameSample(
      Multimodal.withPayload(media, "text"), "doc_id", "payload",
      frameBytes = 4, stride = 2)
      .orderBy("id", "frame_idx").collect()
    // doc 1: frames 0..2 (4+4+2 bytes), stride 2 → idx 0 and 2
    val d1 = out.filter(_.getLong(0) == 1L)
    assert(d1.map(_.getLong(1)).toSeq == Seq(0L, 2L))
    assert(new String(d1(0).getAs[Array[Byte]](2)) == "abcd")
    assert(new String(d1(1).getAs[Array[Byte]](2)) == "ij")
    // doc 2: one partial frame; doc 3: empty payload → no frames
    assert(out.count(_.getLong(0) == 2L) == 1)
    assert(!out.exists(_.getLong(0) == 3L))
  }

  test("resizeStub yields fixed-size output with monotone source sampling") {
    val out = Multimodal.resizeStub(
      Multimodal.withPayload(docs, "text"), "doc_id", "payload", 4, 2)
      .orderBy("id").collect()
    assert(out.forall(_.getAs[Array[Byte]](1).length == 8))
    assert(out.forall(r => r.getInt(2) == 4 && r.getInt(3) == 2))
    // non-empty source: first sample is byte 0, samples never go backwards
    val h = out(0).getAs[Array[Byte]](1)
    assert(h(0) == "hello".getBytes("UTF-8")(0))
    // empty source: zero-filled output, same fixed shape
    assert(out(1).getAs[Array[Byte]](1).forall(_ == 0))
    // upsampling a short payload repeats bytes, never reads out of range
    val xyz = Multimodal.resizeStub(
      Multimodal.withPayload(docs.filter("doc_id = 1"), "text"), "doc_id", "payload", 10, 3)
      .collect()(0).getAs[Array[Byte]](1)
    assert(xyz.length == 30)
    assert(new String(xyz.distinct.sorted) == "ehllo".distinct.sorted.mkString)
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
