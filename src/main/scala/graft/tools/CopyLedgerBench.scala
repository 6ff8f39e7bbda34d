package graft.tools

import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

import graft.plans.GraftSql
import graft.sources.VersionedTable

/** Incremental COPY INTO ledger bench:
  * `runMain graft.tools.CopyLedgerBench [nBatches] [filesPerBatch]`
  * (default 20 × 500 = 10,000 landing files).
  *
  * The claim under test: with the incremental ledger, each COPY commit
  * writes ledger bytes proportional to ITS OWN batch (O(new files)),
  * not to the files ever loaded — the pre-r9 cumulative shape rewrote
  * the whole ledger on every commit and collected it to the driver.
  * Lands `nBatches` batches of `filesPerBatch` one-row parquet files,
  * COPYs after each landing, and reports per-commit `_copyfiles` bytes,
  * the cumulative total a rewrite-per-commit ledger would have written,
  * and the probe wall time (the distributed anti-join of candidates vs
  * the folded ledger). One JSON line per COPY + a summary. */
object CopyLedgerBench {
  def main(args: Array[String]): Unit = {
    val nBatches = args.lift(0).map(_.toInt).getOrElse(20)
    val perBatch = args.lift(1).map(_.toInt).getOrElse(500)
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import spark.implicits._

    val tmp = java.nio.file.Files.createTempDirectory("graft_ledgerbench").toString
    val root = s"$tmp/t"
    val landing = s"$tmp/landing"
    val f = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    VersionedTable.commit(Seq((0L, "seed")).toDF("id", "src"), root)

    def extraBytes(v: Long, name: String): Long = {
      // version dirs are claim-named; resolve through dataFileRefs' dir.
      // Direct file children only — the same probe the production
      // extraBytes uses (sidecar parquet is written flat)
      val dirs = f.listStatus(new Path(root)).map(_.getPath)
        .filter(_.getName.startsWith("v"))
      dirs.flatMap { d =>
        val p = new Path(d, s"_$name")
        if (f.exists(p))
          Some(d.getName ->
            f.listStatus(p).iterator.filter(_.isFile).map(_.getLen).sum)
        else None
      }.toMap.maxByOption(_._1).map(_._2).getOrElse(0L)
    }

    var cumulative = 0L
    var rewriteShape = 0L
    val lines = (1 to nBatches).map { b =>
      // land one batch of one-row files
      ((b * 1000000L) until (b * 1000000L + perBatch)).toDF("id")
        .withColumn("src", lit(s"b$b"))
        .repartition(perBatch)
        .write.mode("append").parquet(landing)
      val t0 = System.nanoTime()
      val loaded = GraftSql.execute(spark,
        s"COPY INTO '$root' FROM '$landing' FILEFORMAT = PARQUET")
        .collect().head.getLong(2)
      val wall = (System.nanoTime() - t0) / 1e9
      val v = VersionedTable.currentVersion(spark, root).get
      val delta = math.max(extraBytes(v, "copyfiles"), extraBytes(v, "copyfull"))
      cumulative += delta
      rewriteShape += cumulative // what a full-rewrite-per-commit pays
      val line = f"""{"batch":$b,"loaded":$loaded,"ledger_bytes_this_commit":$delta,"wall_s":$wall%.2f}"""
      println(line)
      line
    }
    val ledger = VersionedTable.copyLedger(spark, root,
      VersionedTable.currentVersion(spark, root).get).get
    println(f"""{"total_files":${ledger.count()},"incremental_total_bytes":$cumulative,"rewrite_shape_total_bytes":$rewriteShape,"ratio":${rewriteShape.toDouble / math.max(cumulative, 1L)}%.1f}""")
    System.err.println(lines.mkString("[copy-ledger-bench]\n", "\n", ""))
    spark.stop()
  }
}
