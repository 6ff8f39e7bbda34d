package graft.tools

import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Conflict-resolution bench:
  * `runMain graft.tools.OccBench <sfDir> [nFiles]`
  *
  * Seeds a clustered versioned table from lineitem, then races a
  * key-scoped COW DELETE against a concurrent blind append (injected in
  * the delete's claim window via the preCommit hook) under both
  * isolation levels. The claim under test: under write-serializable
  * isolation the losing delete REBASES by manifest-union — zero extra
  * Spark jobs, two driver-side manifest reads — while `serializable`
  * pays the full prune + rewrite again. The gap is the recompute cost,
  * which at 100 TB is the whole DML. */
object OccBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nFiles = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import spark.implicits._

    val base = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select($"l_orderkey".as("okey"), $"l_partkey".as("pkey"),
        $"l_quantity".cast("double").as("qty"),
        $"l_comment".as("comment"))

    def seed(root: String): Unit = {
      VersionedTable.commit(base.repartition(4), root)
      val bytes = VersionedTable.fileSizes(spark, root,
        VersionedTable.currentVersion(spark, root).get).values.sum
      VersionedTable.optimize(spark, root, Seq("okey"),
        targetFileBytes = math.max(1L, bytes / nFiles))
    }

    val appendBatch = Seq((1L, 1L, 1.0, "late-arrival")).toDF(
      "okey", "pkey", "qty", "comment")

    def race(root: String): Double = {
      var interleaved = false
      val t0 = System.nanoTime()
      VersionedTable.deleteWhere(spark, root, $"okey" <= 100L,
        preCommit = _ =>
          if (!interleaved) {
            interleaved = true
            VersionedTable.commitAppend(appendBatch, root)
            ()
          })
      (System.nanoTime() - t0) / 1e9
    }

    def uncontended(root: String): Double = {
      val t0 = System.nanoTime()
      VersionedTable.deleteWhere(spark, root, $"okey" <= 100L)
      (System.nanoTime() - t0) / 1e9
    }

    def run(iso: String, f: String => Double): Double = {
      val root = java.nio.file.Files
        .createTempDirectory("graft_occbench").toString + "/t"
      seed(root)
      spark.conf.set(VersionedTable.IsolationKey, iso)
      try f(root) finally spark.conf.unset(VersionedTable.IsolationKey)
    }

    // warm codegen/planner caches so the first timed run isn't cold
    run("write-serializable", uncontended)

    val baseline = run("write-serializable", uncontended)
    val tolerant = run("write-serializable", race)
    val strict = run("serializable", race)
    println(s"""{"bench":"occ-conflict","uncontended_sec":$baseline,""" +
      s""""raced_write_serializable_sec":$tolerant,""" +
      s""""raced_serializable_sec":$strict,""" +
      s""""recompute_overhead_sec":${strict - tolerant}}""")
    spark.stop()
  }
}
