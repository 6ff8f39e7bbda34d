package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line of per-query wall times.
  *
  * Each query is forced through the `noop` sink — full computation of every
  * output column, no disk cost — because `count()` would let Catalyst prune
  * the very work being measured (projections, scores, hashes).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    // ad-hoc runtime conf overrides for bench experiments, e.g.
    // SPARK_GRAFT_BENCH_CONF="spark.sql.adaptive.enabled=false,spark.sql.shuffle.partitions=8"
    sys.env.get("SPARK_GRAFT_BENCH_CONF").foreach(_.split(',').foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k.trim, v.trim)
    })
    // untimed warmup: JIT, codegen, shuffle infra — so per-query numbers
    // measure the operator, not first-query JVM startup
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // optional comma-separated allowlist for focused A/B runs
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(',').map(_.trim).toSet)
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_(n)) }
    // best-of-N per query (reported in the JSON): the VM's host-level CPU
    // steal makes single shots vary ±2x (r2 saw a 3.4x outlier survive
    // best-of-2 on a 1.1s-steady-state query); 3 samples is the floor that
    // keeps one steal burst from defining a number
    val repeat = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEAT", "3").toInt.max(1)
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to repeat).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","best_of":$repeat}""")
    spark.stop()
  }
}
