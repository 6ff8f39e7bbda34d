package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Z-order clustering: after interleaved-bit layout, file pruning works
  * on EVERY participating dimension — the case a lexicographic sort
  * cannot serve (its trailing columns stripe across all files). */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("graft_zorder").toString + "/t"

  // a 64x64 uniform grid: both dimensions matter, neither dominates
  private def grid(root: String): Long = {
    val df = spark.range(0, 4096).toDF("i")
      .withColumn("x", $"i" % 64)
      .withColumn("y", floor($"i" / 64).cast("long"))
      .withColumn("pad", lpad($"i".cast("string"), 64, "g"))
      .drop("i")
    VersionedTable.commit(df, root)
  }

  private def fileBytes(root: String): Long = {
    val v = VersionedTable.currentVersion(spark, root).get
    val dir = new org.apache.hadoop.fs.Path(root, f"v$v%08d")
    dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .listStatus(dir).filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
  }

  test("z-order prunes on both dimensions; lexicographic only on the first") {
    val rootLex = freshRoot(); grid(rootLex)
    val rootZ = freshRoot(); grid(rootZ)
    val target = fileBytes(rootLex) / 16

    VersionedTable.optimize(spark, rootLex, Seq("x", "y"), targetFileBytes = target)
    VersionedTable.optimizeZOrder(spark, rootZ, Seq("x", "y"), targetFileBytes = target)
    val vLex = VersionedTable.currentVersion(spark, rootLex).get
    val vZ = VersionedTable.currentVersion(spark, rootZ).get

    val yPred = $"y" >= 10L && $"y" < 14L // a narrow TRAILING-dimension band
    val (lexKept, lexTotal) = VersionedTable.prunedFiles(spark, rootLex, vLex, yPred)
    val (zKept, zTotal) = VersionedTable.prunedFiles(spark, rootZ, vZ, yPred)
    assert(lexTotal >= 8 && zTotal >= 8)
    // lexicographic (x, y): y stripes across every x-run — nothing prunes
    assert(lexKept.size == lexTotal, "lex layout should not prune a y-band")
    // z-order: the y-band lives in a bounded set of z-ranges
    assert(zKept.size * 2 <= zTotal,
      s"z-order should prune at least half the files, kept ${zKept.size} of $zTotal")

    // the leading dimension still prunes on BOTH layouts
    val xPred = $"x" >= 10L && $"x" < 14L
    val (lexKeptX, _) = VersionedTable.prunedFiles(spark, rootLex, vLex, xPred)
    val (zKeptX, _) = VersionedTable.prunedFiles(spark, rootZ, vZ, xPred)
    assert(lexKeptX.size < lexTotal && zKeptX.size * 2 <= zTotal)

    // results identical on every layout, pruned or not
    for (pred <- Seq(yPred, xPred, $"x" === 3L && $"y" === 60L)) {
      val a = VersionedTable.readWhere(spark, rootLex, pred)
        .orderBy("x", "y").collect().map(_.toSeq).toSeq
      val b = VersionedTable.readWhere(spark, rootZ, pred)
        .orderBy("x", "y").collect().map(_.toSeq).toSeq
      assert(a == b && a.nonEmpty)
    }
  }

  test("equi-depth z-order prunes a SKEWED dimension where linear scaling cannot") {
    // 4096 rows: `skew` is uniform 0..99 for 99% of rows with a handful
    // of 1e9 outliers — linear min/max scaling maps 99% of values to
    // bucket 0, so the skewed dimension contributes nothing to the
    // z-value and a skew-band query keeps every file; equi-depth cut
    // points ignore the outliers' magnitude and spread the mass
    def skewed(root: String): Unit = VersionedTable.commit(
      spark.range(0, 4096).toDF("i")
        .withColumn("skew", when($"i" % 512 === 0, lit(1000000000L)).otherwise($"i" % 100))
        .withColumn("user", $"i" % 64)
        .withColumn("pad", lpad($"i".cast("string"), 64, "g"))
        .drop("i"), root)
    val rootLin = freshRoot(); skewed(rootLin)
    val rootEq = freshRoot(); skewed(rootEq)
    val target = fileBytes(rootLin) / 32
    VersionedTable.optimizeZOrder(spark, rootLin, Seq("skew", "user"),
      targetFileBytes = target)
    VersionedTable.optimizeZOrder(spark, rootEq, Seq("skew", "user"),
      targetFileBytes = target, equiDepth = true)
    val vLin = VersionedTable.currentVersion(spark, rootLin).get
    val vEq = VersionedTable.currentVersion(spark, rootEq).get

    val band = $"skew" >= 40L && $"skew" < 50L
    val (linKept, linTotal) = VersionedTable.prunedFiles(spark, rootLin, vLin, band)
    val (eqKept, eqTotal) = VersionedTable.prunedFiles(spark, rootEq, vEq, band)
    assert(linTotal >= 8 && eqTotal >= 8)
    assert(linKept.size == linTotal,
      s"linear scale should be blind to the skewed band, kept ${linKept.size} of $linTotal")
    // a 10%-of-mass band: z-interleaving spends half the prefix bits on
    // `user`, so the ideal is ~sqrt(w) of the files — a third pruned is
    // the conservative floor (the linear layout prunes ZERO)
    assert(eqKept.size * 3 <= eqTotal * 2,
      s"equi-depth should prune at least a third, kept ${eqKept.size} of $eqTotal")
    // a point value occupies ~1/100 of the mass: most files' value spans
    // miss it entirely
    val (eqKeptPt, _) = VersionedTable.prunedFiles(spark, rootEq, vEq, $"skew" === 42L)
    val (linKeptPt, _) = VersionedTable.prunedFiles(spark, rootLin, vLin, $"skew" === 42L)
    info(s"band: eq ${eqKept.size}/$eqTotal lin ${linKept.size}/$linTotal; " +
      s"point: eq ${eqKeptPt.size} lin ${linKeptPt.size}")
    assert(linKeptPt.size == linTotal)
    assert(eqKeptPt.size * 2 <= eqTotal,
      s"equi-depth should prune at least half for a point, kept ${eqKeptPt.size} of $eqTotal")
    // the other dimension still prunes, and results match exactly
    val (eqKeptU, _) = VersionedTable.prunedFiles(spark, rootEq, vEq,
      $"user" >= 10L && $"user" < 14L)
    assert(eqKeptU.size * 2 <= eqTotal)
    for (pred <- Seq(band, $"user" === 3L, $"skew" === 1000000000L)) {
      val a = VersionedTable.readWhere(spark, rootLin, pred)
        .orderBy("skew", "user", "pad").collect().map(_.toSeq).toSeq
      val b = VersionedTable.readWhere(spark, rootEq, pred)
        .orderBy("skew", "user", "pad").collect().map(_.toSeq).toSeq
      assert(a == b && a.nonEmpty)
    }
  }

  test("z-order rejects non-numeric and wrong arity") {
    val root = freshRoot(); grid(root)
    intercept[IllegalArgumentException] {
      VersionedTable.optimizeZOrder(spark, root, Seq("x"))
    }
    intercept[Exception] {
      VersionedTable.optimizeZOrder(spark, root, Seq("x", "pad"))
    }
  }
}
