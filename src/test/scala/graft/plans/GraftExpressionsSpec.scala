package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.{TextHash, VectorFunctions}

class GraftExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Array(0.25f, -1.5f, 3.125f), Array(2.0f, 0.5f, -0.125f)),
    (2L, Array(1e-3f, 1e3f, -7.75f), Array(-0.5f, 0.25f, 8.0f)),
    (3L, Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f))
  ).toDF("id", "a", "b")

  test("FloatDotProduct is bit-identical to the HOF fold") {
    val out = vecs.select(
      VectorFunctions.dotD(col("a"), col("b")).as("native"),
      VectorFunctions.dotHof(col("a"), col("b")).as("hof")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("PolyHash matches the HOF char fold, including empty string") {
    val docs = Seq("", "a", "ab", "hello world 123",
      "the quick brown fox jumps over the lazy dog").toDF("s")
    val out = docs.select(
      TextHash.charPolyHash(col("s")).as("native"),
      TextHash.charPolyHashHof(col("s")).as("hof")).collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // known value: "ab" → 97*31 + 98 = 3105
    assert(docs.filter(col("s") === "ab")
      .select(TextHash.charPolyHash(col("s"))).collect()(0).getLong(0) == 3105L)
  }

  test("PolyHashArray hashes each element, preserving order and nulls") {
    val df = Seq(Tuple1(Seq("ab", "", "ba"))).toDF("arr")
    val hashed = df.select(TextHash.shingleHashes(col("arr"))).collect()(0).getSeq[Long](0)
    assert(hashed == Seq(3105L, 0L, 98L * 31 + 97))
    val withNull = df.select(TextHash.shingleHashes(
      array(lit("ab"), lit(null).cast("string")))).collect()(0).getSeq[Any](0)
    assert(withNull == Seq(3105L, null))
  }

  test("MinHashSignature equals the HOF formulation, nulls on empty input") {
    val df = Seq(
      Tuple1(Seq(17L, 99312L, 5L, 123456789L)),
      Tuple1(Seq(0L)),
      Tuple1(Seq.empty[Long])
    ).toDF("hs")
    val out = df.select(
      TextHash.minhashSig(col("hs"), 8).as("native"),
      TextHash.minhashSigHof(col("hs"), 8).as("hof")).collect()
    out.foreach(r => assert(r.getSeq[Any](0) == r.getSeq[Any](1)))
  }

  test("wideHash stays below the 55-bit modulus and separates strings") {
    val out = Seq("abc", "abd", "").toDF("s")
      .select(TextHash.wideHash(col("s"))).collect().map(_.getLong(0))
    assert(out.distinct.length == 3 || out(2) == 0L)
    assert(out.forall(h => h >= 0 && h < graft.plans.GraftExpressions.WideMod))
    assert(out(0) == (("a".head.toLong * 131 + 'b') * 131 + 'c') % graft.plans.GraftExpressions.WideMod)
  }

  test("WordShingles equals the HOF normalize/split/shingle chain") {
    val docs = Seq(
      "The quick brown fox jumps over the lazy dog",
      "a b a b a b",           // repeated shingles → distinct, order kept
      "Hello, World! 42",      // punctuation collapsed
      "one two",               // below n → empty
      ""                       // empty text
    ).toDF("text")
    val out = docs.select(
      TextHash.shingleSet(col("text"), 3).as("native"),
      TextHash.shinglesFromWords(TextHash.wordsOf(col("text")), 3).as("hof")).collect()
    out.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("LshSignature equals the composed plane-dot formulation") {
    val dims = 5
    val vecsN = Seq(
      Array(0.5f, -1.0f, 2.0f, 0.0f, -0.25f),
      Array(1.0f, 1.0f, 1.0f, 1.0f, 1.0f),
      Array(-3.0f, 0.5f, -0.5f, 2.5f, 0.125f)
    ).map(Tuple1(_)).toDF("v")
    for (t <- 0 until 3) {
      val nPlanes = 8
      val composed = (0 until nPlanes).map { p =>
        val plane = array((0 until dims).map(d =>
          lit(LshSignature.coef(t * nPlanes + p, d))): _*)
        when(VectorFunctions.dotHof(col("v"), plane) > 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)
      val native = org.apache.spark.sql.graft.ColumnBridge.column(
        LshSignature(org.apache.spark.sql.graft.ColumnBridge.expression(col("v")), nPlanes, t))
      val out = vecsN.select(native.as("n"), composed.as("c")).collect()
      out.foreach(r => assert(r.getLong(0) == r.getLong(1), s"table $t"))
    }
  }

  test("WordWindowHashes equals the HOF slice/concat_ws formulation") {
    import graft.functions.TextHash
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(200)
    val out = docs.select(
        TextHash.positionalWindowHashes(col("text"), 8).as("n"),
        TextHash.positionalWindowHashesHof(col("text"), 8).as("c"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getSeq[org.apache.spark.sql.Row](0) == r.getSeq[org.apache.spark.sql.Row](1))
    }
    // degenerate inputs: short doc and empty string → empty arrays
    val edge = Seq("too short", "").toDF("text")
      .select(TextHash.positionalWindowHashes(col("text"), 8).as("n"))
      .collect()
    edge.foreach(r => assert(r.getSeq[Any](0).isEmpty))
  }

  test("native expressions run inside WholeStageCodegen") {
    // a file scan (not a pre-computed LocalTableScan) so codegen stages form
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = emb.select(VectorFunctions.dotD(col("embedding"), col("embedding")))
      .queryExecution.executedPlan
    val codegenStages = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w }
    assert(codegenStages.nonEmpty)
    assert(codegenStages.exists(_.toString.contains("graft_dot")))
    assert(!plan.toString.contains("CodegenFallback"))
  }

  test("GraftExtensions registers SQL functions") {
    GraftExtensions.install(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d, " +
        "graft_poly_hash('ab') AS h, graft_poly_hash_array(array('ab')) AS ha")
      .collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getLong(1) == 3105L)
    assert(r.getSeq[Long](2) == Seq(3105L))
  }
}
