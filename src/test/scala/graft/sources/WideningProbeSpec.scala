package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Empirical ground truth for metadata-only type widening: can this
  * Spark's parquet readers serve a file written INT32/FLOAT under a
  * reader schema of LongType/DoubleType (the widenings Delta allows as
  * metadata-only)? If these fail, ALTER COLUMN TYPE must stay a full
  * rewrite. */
class WideningProbeSpec extends SparkSpec {
  import spark.implicits._

  test("parquet reads widen int->long, int->double, float->double, date->timestamp_ntz") {
    val dir = java.nio.file.Files.createTempDirectory("graft_widen").toString
    Seq((1, 1.5f, "2024-01-02")).toDF("i", "f", "d")
      .withColumn("d", col("d").cast("date"))
      .write.parquet(dir + "/p")
    val widened = StructType(Seq(
      StructField("i", LongType), StructField("f", DoubleType),
      StructField("d", TimestampNTZType)))
    val row = spark.read.schema(widened).parquet(dir + "/p").collect().head
    assert(row.getLong(0) == 1L)
    assert(math.abs(row.getDouble(1) - 1.5) < 1e-9)
    // int -> double as well (Delta allows int->double)
    val r2 = spark.read.schema(StructType(Seq(StructField("i", DoubleType))))
      .parquet(dir + "/p").collect().head
    assert(r2.getDouble(0) == 1.0)
    // and decimal scale/precision widening: decimal(5,2) -> decimal(10,2)
    Seq(BigDecimal("123.45")).toDF("m")
      .select(col("m").cast(DecimalType(5, 2)).as("m")).write.parquet(dir + "/q")
    val r3 = spark.read.schema(StructType(Seq(StructField("m", DecimalType(10, 2)))))
      .parquet(dir + "/q").collect().head
    assert(r3.getDecimal(0).toPlainString == "123.45")
    // decimal SCALE growth: the reader RESCALES the stored unscaled
    // values (123.45 in decimal(5,2) reads as exactly 123.4500 under
    // decimal(10,4)) — so widenOk admits scale growth that keeps the
    // integral digits
    val r4 = spark.read.schema(StructType(Seq(StructField("m", DecimalType(10, 4)))))
      .parquet(dir + "/q").collect().head
    assert(r4.getDecimal(0).toPlainString == "123.4500")
  }

  test("the refused pairs are empirically unserveable: narrowings throw") {
    val dir = java.nio.file.Files.createTempDirectory("graft_widen_neg").toString
    Seq((5000000000L, BigDecimal("123.45"))).toDF("l", "m")
      .select(col("l"), col("m").cast(DecimalType(5, 2)).as("m"))
      .write.parquet(dir + "/p")
    // long file under an int reader schema: narrowing, must not serve
    intercept[Throwable] {
      spark.read.schema(StructType(Seq(StructField("l", IntegerType))))
        .parquet(dir + "/p").collect()
    }
    // decimal scale NARROWING (integral digits shrink): throws
    intercept[Throwable] {
      spark.read.schema(StructType(Seq(StructField("m", DecimalType(4, 1)))))
        .parquet(dir + "/p").collect()
    }
  }
}
