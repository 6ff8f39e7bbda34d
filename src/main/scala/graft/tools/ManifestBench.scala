package graft.tools

import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Delta-manifest bench:
  * `runMain graft.tools.ManifestBench [levels] [commitsPerLevel]`
  *
  * The claim under test (VERDICT r14 ask #1): with the delta-manifest
  * commit form, per-commit cost is O(changed), FLAT in the carried ref
  * count, while the full form's carry (stats + sizes + manifest
  * rewritten whole every commit) grows linearly with it. For each ref
  * level the tool seeds a table whose initial commit fans out into
  * ~level files, then times K single-file appends under the FULL form
  * (delta floor above any table) and K more under the DELTA form
  * (floor 0), and reads the head back both ways — the fold must not
  * move the read. One JSON line per (level, form). */
object ManifestBench {
  def main(args: Array[String]): Unit = {
    val levels = args.headOption.map(_.split(',').map(_.toInt).toSeq)
      .getOrElse(Seq(100, 1000, 10000))
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import spark.implicits._

    def timeMs[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e6)
    }

    levels.foreach { level =>
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_mb_$level").toString + "/t"
      // seed: ~level files in ONE commit (a repartition fan-out with AQE
      // coalescing off — it would fold the tiny shuffle partitions back
      // together), so the carried set is at scale before the first
      // timed append
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      try VersionedTable.commit(
        spark.range(0, level.toLong * 4).toDF("id")
          .withColumn("payload", concat(lit("p"), $"id"))
          .repartition(level), root)
      finally spark.conf
        .set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      def appendOne(i: Long): Double =
        timeMs(VersionedTable.commitAppend(
          Seq((1000000L + i, s"x$i")).toDF("id", "payload")
            .coalesce(1), root))._2
      def run(form: String): Unit = {
        val walls = (1 to k).map(i => appendOne(
          (if (form == "full") 0 else 100000) + i))
        val v = VersionedTable.currentVersion(spark, root).get
        val refs = VersionedTable.dataFileRefs(spark, root, v).size
        val (_, readMs) = timeMs(VersionedTable.read(spark, root).count())
        val sorted = walls.sorted
        println(f"""{"bench":"manifest","form":"$form","carried_refs":$refs,""" +
          f""""commits":$k,"commit_ms_med":${sorted(k / 2)}%.0f,""" +
          f""""commit_ms_min":${sorted.head}%.0f,"read_ms":$readMs%.0f}""")
      }
      // FULL form first (floor above any table), DELTA second (floor 0,
      // default fold interval) on the SAME grown table
      spark.conf.set(VersionedTable.DeltaFloorKey, Int.MaxValue.toString)
      run("full")
      spark.conf.set(VersionedTable.DeltaFloorKey, "0")
      run("delta")
      spark.conf.unset(VersionedTable.DeltaFloorKey)
    }

    // DEEP-CHAIN COLD OPEN: the r14 no-replay property under the delta
    // form — a fresh reader's FIRST metadata touch folds the chain
    // (≤ fold-interval small reads); the memo then serves repeats. A
    // 60-commit chain at the default interval (20) holds two folds and
    // a 19-deep tail; `history` sweeps every version once (the
    // intermediate-level memoization keeps that one chain walk total).
    val root = java.nio.file.Files
      .createTempDirectory("graft_mb_deep").toString + "/t"
    spark.conf.set(VersionedTable.DeltaFloorKey, "0")
    try {
      VersionedTable.commit(
        spark.range(0, 64).toDF("id")
          .withColumn("payload", concat(lit("p"), $"id")), root)
      (1 to 60).foreach(i => VersionedTable.commitAppend(
        Seq((1000L + i, s"x$i")).toDF("id", "payload").coalesce(1), root))
      val head = VersionedTable.currentVersion(spark, root).get
      // TRUE cold open: the fold memo keys on (root, version, marker
      // identity) — a byte-identical COPY at a fresh root pays the whole
      // chain walk from disk, exactly what a new reader process (or a
      // restored table) pays
      val cold = java.nio.file.Files
        .createTempDirectory("graft_mb_deepc").toString + "/t"
      def copyTree(a: java.nio.file.Path, b: java.nio.file.Path): Unit = {
        java.nio.file.Files.walk(a).forEach { p =>
          val q = b.resolve(a.relativize(p))
          if (java.nio.file.Files.isDirectory(p))
            java.nio.file.Files.createDirectories(q)
          else java.nio.file.Files.copy(p, q)
        }
      }
      copyTree(java.nio.file.Paths.get(root), java.nio.file.Paths.get(cold))
      val (refs, coldMs) =
        timeMs(VersionedTable.dataFileRefs(spark, cold, head))
      val (_, warmMs) =
        timeMs(VersionedTable.dataFileRefs(spark, cold, head))
      val (_, histMs) =
        timeMs(VersionedTable.history(spark, cold).collect())
      val (_, ttMs) = timeMs(
        VersionedTable.readVersion(spark, cold, head - 30).count())
      println(f"""{"bench":"manifest_deep","commits":61,"refs":${refs.size},""" +
        f""""cold_fold_ms":$coldMs%.0f,"warm_fold_ms":$warmMs%.1f,""" +
        f""""history_ms":$histMs%.0f,"timetravel_mid_ms":$ttMs%.0f}""")
    } finally spark.conf.unset(VersionedTable.DeltaFloorKey)
    spark.stop()
  }
}
