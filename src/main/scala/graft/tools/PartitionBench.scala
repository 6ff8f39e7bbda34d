package graft.tools

import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

import graft.sources.VersionedTable

/** Partition-spec bench: `runMain graft.tools.PartitionBench [sfDir]`.
  *
  * The reference's own load shape is hourly/date batches; the most
  * common big-table maintenance verb is date retention. Measures, on
  * the events table partitioned by day vs the same table unpartitioned:
  *   - `DELETE WHERE d < cutoff` — data bytes written (partitioned:
  *     metadata-only manifest drop = 0; unpartitioned: the COW rewrite)
  *   - one-day `readWhere` file pruning (files opened / total)
  * One JSON line per road. */
object PartitionBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)

    val events = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id").as("id"), col("user_id"),
        col("ts"), to_date(col("ts")).as("d"), col("value"))
    val days = events.select(col("d")).distinct()
      .orderBy(col("d")).collect().map(_.getDate(0))
    val cutoff = days(days.length / 2)
    val probe = days.last

    // bytes the commit wrote FRESH: refs not carried from the previous
    // version (robust to claim-named dirs)
    def freshDataBytes(root: String, v: Long): Long = {
      val prev = VersionedTable.dataFileRefs(spark, root, v - 1).toSet
      val sizeOf = VersionedTable.fileSizes(spark, root, v)
      VersionedTable.dataFileRefs(spark, root, v)
        .filterNot(prev)
        .map(sizeOf).sum
    }
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    Seq(true, false).foreach { partitioned =>
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_part_$partitioned").toString
      val root = s"$tmp/t"
      VersionedTable.commit(events, root,
        partitionBy = if (partitioned) Seq("d") else Nil)
      val (kept, total) = VersionedTable.prunedFiles(spark, root, 1L,
        col("d") === lit(probe))
      val (v, wall) = time(VersionedTable.deleteWhere(spark, root,
        col("d") < lit(cutoff)))
      val bytes = freshDataBytes(root, v)
      val rows = VersionedTable.read(spark, root).count()
      println(f"""{"partitioned":$partitioned,"retention_delete_bytes":$bytes,"retention_delete_s":$wall%.2f,"rows_after":$rows,"one_day_files_opened":${kept.size},"files_total":$total}""")
    }
    spark.stop()
  }
}
