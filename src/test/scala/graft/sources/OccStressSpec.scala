package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** REAL-THREAD optimistic-concurrency stress: unlike the orchestrated
  * interleavings in SinksSpec/MaintenanceOccSpec (which pin one specific
  * race via preCommit hooks), this spec races genuinely concurrent
  * writers — appenders, a row-level updater, and a compactor — against
  * one table and asserts the final state is exactly the serial union.
  * Deterministic because same-JVM writers serialize their validate→
  * publish section on the per-root publish monitor: no batch can be
  * dropped by the check-then-act window, however the threads interleave. */
class OccStressSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("graft_occstress").toString + "/t"

  test("4 appenders × 3 batches + updater + compactor: exact serial union") {
    val root = freshRoot()
    // seed: 20 rows owned by "thread" -1
    VersionedTable.commit(
      (0L until 20L).map(i => (-1, i, "seed")).toDF("writer", "seq", "tag"),
      root)

    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val nAppenders = 4; val batches = 3; val batchRows = 10L
    val appenders = (0 until nAppenders).map { w =>
      new Thread(() => {
        try {
          (0 until batches).foreach { b =>
            val batch = (0L until batchRows)
              .map(i => (w, b * batchRows + i, "append"))
              .toDF("writer", "seq", "tag")
            VersionedTable.commitAppend(batch, root)
          }
        } catch { case t: Throwable => errors.add(t) }
      }, s"appender-$w")
    }
    // row-level COW updates over the seed slice, racing the appends
    val updater = new Thread(() => {
      try (0 until 3).foreach { i =>
        VersionedTable.updateWhere(spark, root,
          col("writer") === -1 && col("seq") === i.toLong,
          Map("tag" -> lit(s"upd$i")))
      } catch { case t: Throwable => errors.add(t) }
    }, "updater")
    // the longest-window writer: whole-table layout rewrites mid-flight
    val compactor = new Thread(() => {
      try (0 until 2).foreach { _ =>
        Thread.sleep(150)
        VersionedTable.compact(spark, root)
      } catch { case t: Throwable => errors.add(t) }
    }, "compactor")

    val all = appenders :+ updater :+ compactor
    all.foreach(_.start()); all.foreach(_.join(300000))
    assert(errors.isEmpty, s"writer threads failed: ${errors.peek()}")

    val fin = VersionedTable.read(spark, root).cache()
    try {
      // every appended row exactly once — nothing lost to any interleaving
      val appended = fin.where(col("tag") === "append")
      assert(appended.count() == nAppenders * batches * batchRows,
        "an append batch was lost or duplicated")
      assert(appended.select("writer", "seq").distinct().count() ==
        nAppenders * batches * batchRows)
      // every update applied; seed rows neither lost nor duplicated
      val seedRows = fin.where(col("writer") === -1)
      assert(seedRows.count() == 20)
      (0 until 3).foreach { i =>
        assert(seedRows.where(col("seq") === i.toLong).head.getString(2)
          == s"upd$i", s"update $i lost (likely to a layout rewrite)")
      }
    } finally fin.unpersist()
  }

  test("validation-to-claim window: a publish landing after a passed " +
    "validation forces a marker collision, never a silent stale publish") {
    // Pins the exact interleaving behind the rare StoreAdapterSpec
    // lost-update flake: writer X validates (current == base, passes),
    // then a competing commit publishes base+1, then X claims its
    // number. X's claim MUST collide (it contends for base+1, already
    // taken) and its re-validation must raise — publishing X's merge
    // under a fresh number would drop the competitor's rows. The
    // competing commit is injected from inside X's own preCommit
    // closure (after its validation check), ON ITS SECOND INVOCATION —
    // preCommit runs once at the version claim (2b) and once inside the
    // publish lock (3c); only an injection at the publish-lock call
    // lands inside the validate→claim window. The per-root monitor is
    // reentrant, so the inner commit proceeds as a cross-process winner
    // would.
    val root = freshRoot()
    VersionedTable.commit(Seq((0L, "seed")).toDF("id", "tag"), root)
    val base = VersionedTable.currentVersion(spark, root)
    assert(base.contains(1L))
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val staleMerge = Seq((0L, "seed"), (1L, "mine")).toDF("id", "tag")
    val conflicted =
      try {
        VersionedTable.commit(staleMerge, root, preCommit = _ => {
          val now = VersionedTable.currentVersion(spark, root)
          if (now != base) throw new RuntimeException("occ-conflict")
          if (calls.incrementAndGet() == 2)
            VersionedTable.commit(
              Seq((0L, "seed"), (101L, "theirs")).toDF("id", "tag"), root)
        })
        false
      } catch {
        case e: RuntimeException if e.getMessage == "occ-conflict" => true
      }
    assert(conflicted,
      "the stale merge published without re-validating — lost update")
    val tags = VersionedTable.read(spark, root)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(tags == Set(0L, 101L),
      s"competing commit's rows must survive, got $tags")
  }
}
