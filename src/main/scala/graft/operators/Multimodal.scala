package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextHash

/** Multimodal-column plumbing (SURVEY.md §2f): media payloads travel as
  * opaque `binary` columns with typed metadata columns beside them; the
  * decode step is STUBBED deterministically (no image/audio codecs in this
  * environment) while everything Spark-level — schema, partition sizing,
  * batch iteration, columnar metadata — is real.
  *
  * Scale design: payloads stay opaque end-to-end (never parsed by
  * Catalyst, never shuffled unless a shuffle is explicitly asked for);
  * metadata extraction is columnar and map-side only;
  * `spark.sql.files.maxPartitionBytes` bounds per-task payload memory; the
  * per-batch decode path is `mapPartitions` over an iterator — constant
  * memory, no driver collect.
  */
object Multimodal {

  /** Derive an opaque binary payload column from a string column (the
    * environment's stand-in for real media bytes; UTF-8, so SQL engines
    * agree on every byte). */
  def withPayload(df: DataFrame, srcCol: String, payloadCol: String = "payload"): DataFrame =
    df.withColumn(payloadCol, col(srcCol).cast("binary"))

  /** m1: typed metadata from an opaque payload — size, content digest, and
    * the stub "decode": a deterministic header-derived pseudo format /
    * width / height (in production this is the codec's header parse; the
    * arithmetic below is a fixed stand-in so oracles can verify the
    * plumbing end-to-end).
    *
    * `md5` is available in every engine; the digest is folded to a long
    * with the engine-neutral polynomial hash (TextHash.charPolyHash).
    */
  def extractMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val fp = TextHash.charPolyHash(md5(col(payloadCol)))
    df
      .withColumn("n_bytes", length(col(payloadCol)).cast("long"))
      .withColumn("__fp", fp)
      .withColumn("format",
        element_at(array(lit("png"), lit("jpeg"), lit("wav")), (col("__fp") % 3 + 1).cast("int")))
      .withColumn("width",  (lit(16) + col("__fp") % 480).cast("long"))
      // `div` = integer division (Column./ would be double division)
      .withColumn("height", expr("cast(16 + (__fp div 480) % 270 as bigint)"))
      .withColumn("n_pixels", (col("width") * col("height")).cast("long"))
      .select(col(idCol), col("n_bytes"), col("__fp").as("content_hash"),
        col("format"), col("width"), col("height"), col("n_pixels"))
  }

  /** Frame sampling over an opaque media payload: every `stride`-th
    * fixed-size chunk becomes one output row (id, frame_idx, frame_bytes).
    * The chunking is the STUB for codec-aware frame extraction; the
    * fan-out plumbing is real — one input row yields many output rows via
    * an iterator flatMap, so memory stays bounded by one payload
    * regardless of frame count (no collect, no array materialization of
    * all frames at once).
    *
    * Scale: map-side only; downstream per-frame work (decode, embed)
    * repartitions on (id, frame_idx) if it needs balancing.
    */
  def frameSample(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      frameBytes: Int,
      stride: Int): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("frame_idx", LongType, nullable = false),
      StructField("frame_bytes", BinaryType, nullable = false)))
    val input = df.select(col(idCol).cast("long"), col(payloadCol))
    val rows: Dataset[Row] = input.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val nFrames = (bytes.length + frameBytes - 1) / frameBytes
        (0 until nFrames by stride).iterator.map { f =>
          val from = f * frameBytes
          val until = math.min(from + frameBytes, bytes.length)
          Row(id, f.toLong, java.util.Arrays.copyOfRange(bytes, from, until))
        }
      }
    }(org.apache.spark.sql.Encoders.row(out))
    rows.toDF()
  }

  /** Resize: map each payload to a fixed-size representation (the STUB
    * picks `outBytes` evenly-strided bytes — in production this is the
    * codec decode + bilinear resample + re-encode; same contract: binary
    * in, fixed-size binary out, map-side only, bounded by one payload).
    * Emits the resized payload plus its declared output dims so downstream
    * schema consumers (training shard writers) see typed metadata, not
    * just bytes. */
  def resizeStub(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      outWidth: Int,
      outHeight: Int): DataFrame = {
    val outBytes = outWidth * outHeight
    val out = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("resized", BinaryType, nullable = false),
      StructField("out_width", IntegerType, nullable = false),
      StructField("out_height", IntegerType, nullable = false)))
    val input = df.select(col(idCol).cast("long"), col(payloadCol))
    val rows: Dataset[Row] = input.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val res = new Array[Byte](outBytes)
        if (bytes.nonEmpty) {
          var i = 0
          while (i < outBytes) {
            // even stride over the source (nearest-neighbor resample shape)
            res(i) = bytes(((i.toLong * bytes.length) / outBytes).toInt)
            i += 1
          }
        }
        Row(id, res, outWidth, outHeight)
      }
    }(org.apache.spark.sql.Encoders.row(out))
    rows.toDF()
  }

  /** Batch feature extraction over payload bytes: real `mapPartitions`
    * plumbing (iterator-in/iterator-out, constant memory, no collect) with
    * a STUB featurizer — byte-histogram moments standing in for a codec +
    * model forward pass. Output schema: (id, n_bytes, mean_byte, var_byte).
    *
    * In production the function body is the only thing that changes
    * (decode → tensor → features); the batching, schema contract, and
    * partition behavior are exactly this.
    */
  def decodeFeatures(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("mean_byte", DoubleType, nullable = false),
      StructField("var_byte", DoubleType, nullable = false)))
    val input = df.select(col(idCol).cast("long"), col(payloadCol))
    val rows: Dataset[Row] = input.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val n = bytes.length.toLong
        var s = 0.0; var s2 = 0.0
        var i = 0
        while (i < bytes.length) { val v = (bytes(i) & 0xff).toDouble; s += v; s2 += v * v; i += 1 }
        val mean = if (n > 0) s / n else 0.0
        val vb = if (n > 0) s2 / n - mean * mean else 0.0
        Row(id, n, mean, vb)
      }
    }(org.apache.spark.sql.Encoders.row(out))
    rows.toDF()
  }
}
