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
      // release per-key executor state before the next key is timed:
      // cached tables unpersist via the catalog; localCheckpoint RDD
      // blocks are freed by the ContextCleaner only after their frames
      // are GARBAGE-COLLECTED — and a ~100 s run never triggers a full
      // GC on its own, so block-manager memory otherwise ratchets up
      // across 67 keys × N repeats and later keys evict/spill (measured
      // 2–4× inflation on late keys vs the same key run in isolation)
      spark.catalog.clearCache()
      System.gc()
      name -> times.min
    }
    // REAL micro-batch runs (file source over the same parquet,
    // AvailableNow trigger): the st1–st4 transforms executed as actual
    // Structured Streaming queries, timed next to their batch-equivalent
    // numbers above, with the stream output checked row-equal to the
    // batch result the driver verifies. Skipped when BENCH_ONLY narrows
    // to non-streaming keys.
    val doStream = only.forall(_.exists(_.startsWith("st")))
    val streamJson = if (!doStream) "" else {
      // the file stream source needs a DIRECTORY: stage the events file
      // into a temp dir (link, no copy) — the cloud analog is the landing
      // prefix new files drop into
      val stage = java.nio.file.Files.createTempDirectory("graft_bench_stream")
      java.nio.file.Files.createSymbolicLink(
        stage.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$sfDir/events.parquet"))
      def rowsOf(df: org.apache.spark.sql.DataFrame): Set[String] =
        df.collect().map(_.toString).toSet
      // st1: tumbling-window agg, complete mode — final table IS the agg
      val t1 = System.nanoTime()
      graft.streaming.EventStream
        .start(spark, stage.toString, "bench_mb_st1", availableNow = true)
        .awaitTermination()
      val st1Sec = (System.nanoTime() - t1) / 1e9
      val st1Eq = rowsOf(spark.table("bench_mb_st1")) ==
        rowsOf(SparkEntry.queries("st1_stream_window")(spark, sfDir))
      // st4: update-mode entity state — final state per id = the row from
      // the last micro-batch that touched it: max updated_at (monotone
      // nondecreasing), then min created_at (monotone nonincreasing)
      val t4 = System.nanoTime()
      graft.streaming.StateStream
        .start(spark, stage.toString, "bench_mb_st4", "purchase",
          availableNow = true)
        .awaitTermination()
      val st4Sec = (System.nanoTime() - t4) / 1e9
      val w = org.apache.spark.sql.expressions.Window.partitionBy("id")
        .orderBy(org.apache.spark.sql.functions.col("updated_at").desc,
          org.apache.spark.sql.functions.col("created_at").asc)
      val st4Final = spark.table("bench_mb_st4")
        .withColumn("__rn", org.apache.spark.sql.functions.row_number().over(w))
        .filter("__rn = 1").drop("__rn")
      val st4Eq = rowsOf(st4Final) ==
        rowsOf(SparkEntry.queries("st4_stream_state")(spark, sfDir))
      // st2: the flatMapGroupsWithState sessionizer under a real
      // AvailableNow trigger. Row equality is the WATERMARK SANDWICH
      // (SessionStreamSpec's invariant): every session the final
      // watermark closed must be streamed, and nothing may be streamed
      // that the batch operator doesn't produce — the boundary session
      // per key is legitimately still open when the stream ends.
      import org.apache.spark.sql.functions.{col, max, unix_micros}
      val t2 = System.nanoTime()
      graft.streaming.SessionStream
        .start(spark, stage.toString, "bench_mb_st2", 7200L, availableNow = true)
        .awaitTermination()
      val st2Sec = (System.nanoTime() - t2) / 1e9
      val events = graft.sources.Tables.events(spark, sfDir)
      val maxTsUs = events.agg(max(unix_micros(col("ts")))).collect()(0).getLong(0)
      val batchSessions = graft.operators.Sessionize
        .sessions(events, "user_id", "ts", "event_id", 7200L, "value")
        .select(col("id"), unix_micros(col("session_start")).as("s"),
          unix_micros(col("session_end")).as("e"), col("n_events"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val closedSet = batchSessions
        .filter { case (_, _, e, _) => e + 7200L * 1000000L + 1000L <= maxTsUs }.toSet
      val streamedSet = spark.table("bench_mb_st2")
        .select("user_id", "session_start_us", "session_end_us", "n_events")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val st2Eq = closedSet.subsetOf(streamedSet) &&
        streamedSet.subsetOf(batchSessions.toSet)
      // st3: stream-static enrichment (broadcast dim join + windowed agg)
      // in complete mode — final table equals the batch key exactly
      val t3 = System.nanoTime()
      graft.streaming.EventStream
        .startEnriched(spark, stage.toString,
          graft.sources.Tables.customer(spark, sfDir),
          "c_custkey", "c_mktsegment", "bench_mb_st3", availableNow = true)
        .awaitTermination()
      val st3Sec = (System.nanoTime() - t3) / 1e9
      val st3Eq = rowsOf(spark.table("bench_mb_st3")) ==
        rowsOf(SparkEntry.queries("st3_stream_enrich")(spark, sfDir))
      // st5: watermark-bounded streaming dedup of the at-least-once
      // replayed feed, append mode — redelivered events are identical
      // payloads, so the streamed rows equal the batch distinct exactly
      val t5 = System.nanoTime()
      graft.streaming.EventStream
        .startDedupReplay(spark, stage.toString, "bench_mb_st5",
          graft.queries.TextQueries.ReplayFrom,
          graft.queries.TextQueries.ReplayTo, availableNow = true)
        .awaitTermination()
      val st5Sec = (System.nanoTime() - t5) / 1e9
      val st5Eq = rowsOf(spark.table("bench_mb_st5")) ==
        rowsOf(SparkEntry.queries("st5_stream_dedup")(spark, sfDir))
      // st6: watermarked stream-stream interval join, append mode — inner
      // joins emit eagerly, so the streamed pairs equal the batch join
      val t6 = System.nanoTime()
      graft.streaming.EventStream
        .startAttribution(spark, stage.toString, "bench_mb_st6",
          availableNow = true)
        .awaitTermination()
      val st6Sec = (System.nanoTime() - t6) / 1e9
      val st6Eq = rowsOf(spark.table("bench_mb_st6")) ==
        rowsOf(SparkEntry.queries("st6_stream_join")(spark, sfDir))
      s""","microbatch":{"st1_stream_window":$st1Sec,"st2_stream_session":$st2Sec,"st3_stream_enrich":$st3Sec,"st4_stream_state":$st4Sec,"st5_stream_dedup":$st5Sec,"st6_stream_join":$st6Sec,"st1_equals_batch":$st1Eq,"st2_equals_batch":$st2Eq,"st3_equals_batch":$st3Eq,"st4_equals_batch":$st4Eq,"st5_equals_batch":$st5Eq,"st6_equals_batch":$st6Eq}"""
    }
    // AMORTIZED-INDEX runs: the s3/d6/d10 production split — one-time
    // index/codebook build vs the per-run probe that reuses it. The main
    // per-query numbers above keep the self-contained train-in-query form
    // (what the correctness oracle re-derives); these are the numbers a
    // standing deployment sees per batch. Full runs only.
    val amortJson = if (only.isDefined) "" else {
      import graft.queries.DedupQueries
      def timed(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      def noop(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      val tmp = java.nio.file.Files.createTempDirectory("graft_bench_amort")
      val s3b = timed(DedupQueries.s3Build(spark, sfDir, "bench_amort_ivf", s"$tmp/ivf"))
      val s3p = (1 to repeat)
        .map(_ => timed(noop(DedupQueries.s3Probe(spark, sfDir, "bench_amort_ivf")))).min
      var cent: org.apache.spark.sql.DataFrame = null
      val d6t = timed { cent = DedupQueries.d6Train(spark, sfDir) }
      val d6p = (1 to repeat)
        .map(_ => timed(noop(DedupQueries.d6Probe(spark, sfDir, cent)))).min
      val d10b = timed(DedupQueries.d10Build(spark, sfDir, s"$tmp/didx"))
      val d10p = (1 to repeat)
        .map(_ => timed(noop(DedupQueries.d10Probe(spark, sfDir, s"$tmp/didx")))).min
      val s4b = timed(DedupQueries.s4Build(spark, sfDir, "bench_amort_pq", s"$tmp/pq"))
      val s4p = (1 to repeat)
        .map(_ => timed(noop(DedupQueries.s4Probe(spark, sfDir, "bench_amort_pq")))).min
      val s5b = timed(DedupQueries.s5Build(spark, sfDir, "bench_amort_ivfpq", s"$tmp/ivfpq"))
      val s5p = (1 to repeat)
        .map(_ => timed(noop(DedupQueries.s5Probe(spark, sfDir, "bench_amort_ivfpq")))).min
      s""","amortized":{"s3_build":$s3b,"s3_probe":$s3p,"d6_train":$d6t,"d6_probe":$d6p,"d10_index_build":$d10b,"d10_probe":$d10p,"s4_build":$s4b,"s4_probe":$s4p,"s5_build":$s5b,"s5_probe":$s5p}"""
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","best_of":$repeat$streamJson$amortJson}""")
    spark.stop()
  }
}
