package graft.operators

import graft.SparkSpec
import graft.sources.VersionedTable
import org.apache.spark.sql.functions._

/** The drift→MAINTAIN loop closed ([[AnnIndexes]]): a persisted ANN
  * index REGISTERS against its source versioned table, the maintenance
  * tick MEASURES its recall and recommends `rebuild_ann:<name>` under
  * the floor, and [[VersionedTable.applyMaintenance]] DISPATCHES the
  * rebuild — re-training the geometry on the current corpus. Pinned:
  * the dispatched rebuild is byte-equal to running the build by hand
  * (probe-equals-rebuild), and the rebuilt index's appended-fraction
  * resets to zero (the geometry now owns the whole corpus). */
class AnnMaintenanceSpec extends SparkSpec {

  private def dropIdx(name: String): Unit =
    Seq("", "_centroids", "_codebooks", "_meta").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS $name$s"))

  test("register → drift past floor → MAINTAIN rebuilds → fraction resets, probe = hand rebuild") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val root = java.nio.file.Files
      .createTempDirectory("graft_annm").toString + "/t"
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft_annm_idx").toString
    dropIdx("graft_annm_ivf")
    dropIdx("graft_annm_ref")

    // source-of-truth corpus lives in a versioned table
    VersionedTable.commit(emb, root)
    Similarity.buildIvfIndex(VersionedTable.read(spark, root),
      "vec_id", "embedding", 16, "graft_annm_ivf", s"$idxPath/ivf",
      kmeansIters = 2)
    val spec = AnnIndexes.AnnIndexSpec(
      name = "emb_ivf", kind = "ivf",
      table = "graft_annm_ivf", path = s"$idxPath/ivf",
      idCol = "vec_id", vecCol = "embedding",
      k = 5, nCells = 16, nProbes = 3, coarseIters = 2,
      recallFloor = 0.0, sampleEvery = 50)
    AnnIndexes.register(spark, root, spec)
    assert(AnnIndexes.registered(spark, root) == Seq(spec),
      "registration must round-trip through table properties")

    // fresh geometry: the tick measures it and stays quiet at floor 0
    val fresh = VersionedTable.maintenanceReport(spark, root)
    assert(fresh.annRecall.map(_._1) == Seq("emb_ivf") &&
      fresh.annRecall.head._2 > 0.3,
      s"fresh index must be measured: ${fresh.annRecall}")
    assert(!fresh.recommendations.exists(_.startsWith("rebuild_ann:")))

    // drift: append orthogonally-transformed replicas to BOTH the table
    // and the index (the production O(batch) append contract)
    def drifted(i: Int) = {
      val r = (7 * i) % dim
      val rotated = concat(slice(col("embedding"), r + 1, dim - r),
        slice(col("embedding"), 1, r))
      emb.select((col("vec_id") + lit(i * 1000000000L)).as("vec_id"),
        zip_with(rotated, sequence(lit(0), lit(dim - 1)),
          (x, p) => when((p + lit(i)) % 3 === 0, -x).otherwise(x))
          .as("embedding"))
    }
    Seq(1, 2).foreach { i =>
      val b = drifted(i)
      VersionedTable.commitAppend(b, root)
      Similarity.appendToIvfIndex(spark, "graft_annm_ivf", b,
        "vec_id", "embedding")
    }

    // raise the floor above any plausible recall (re-register replaces
    // the record): the tick must now recommend the rebuild by name
    AnnIndexes.register(spark, root, spec.copy(recallFloor = 0.999))
    val driftedRep = VersionedTable.maintenanceReport(spark, root)
    assert(driftedRep.recommendations.contains("rebuild_ann:emb_ivf"),
      s"recall under floor 0.999 must recommend: $driftedRep")
    val before = AnnIndexes.drift(spark, root,
      AnnIndexes.registered(spark, root).head)
    assert(math.abs(before.appendedFraction - 2.0 / 3.0) < 1e-9,
      s"two appended replicas = 2/3 appended: $before")

    // MAINTAIN: the dispatcher executes the named rebuild
    val done = VersionedTable.applyMaintenance(spark, root)
    assert(done.contains("rebuild_ann:emb_ivf"), s"executed: $done")

    // the geometry now owns the whole corpus: fraction resets to zero
    val after = AnnIndexes.drift(spark, root,
      AnnIndexes.registered(spark, root).head)
    assert(after.appendedFraction == 0.0,
      s"rebuild must reset the appended fraction: $after")

    // probe-equals-rebuild: a HAND build with the same parameters on the
    // same corpus must probe bit-identically to the dispatched rebuild
    val corpus = VersionedTable.read(spark, root)
    Similarity.buildIvfIndex(corpus, "vec_id", "embedding", 16,
      "graft_annm_ref", s"$idxPath/ref", kmeansIters = 2)
    val queries = corpus.filter(pmod(hash(col("vec_id")), lit(50)) === 0)
    val got = Similarity.probeIvfIndex(spark, "graft_annm_ivf", queries,
      "vec_id", "embedding", 5, 16, 3).orderBy("query_id", "rank")
    val want = Similarity.probeIvfIndex(spark, "graft_annm_ref", queries,
      "vec_id", "embedding", 5, 16, 3).orderBy("query_id", "rank")
    assert(got.collect().toSeq == want.collect().toSeq,
      "dispatched rebuild must equal a hand rebuild, probe for probe")

    // unregister: the tick goes metadata-quiet again, index tables stay
    AnnIndexes.unregister(spark, root, "emb_ivf")
    assert(AnnIndexes.registered(spark, root).isEmpty)
    assert(VersionedTable.maintenanceReport(spark, root).annRecall.isEmpty)
    assert(spark.catalog.tableExists("graft_annm_ivf"))
    dropIdx("graft_annm_ivf")
    dropIdx("graft_annm_ref")
  }

  test("a dropped index table degrades to a logged skip, not a dead tick") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val root = java.nio.file.Files
      .createTempDirectory("graft_annm2").toString + "/t"
    VersionedTable.commit(emb, root)
    AnnIndexes.register(spark, root, AnnIndexes.AnnIndexSpec(
      name = "ghost", kind = "ivf",
      table = "graft_annm_ghost", path = "/nowhere",
      idCol = "vec_id", vecCol = "embedding",
      k = 5, nCells = 16, nProbes = 3))
    // the index table was never built: the report still returns, with
    // no measurement and no rebuild recommendation for the ghost
    val rep = VersionedTable.maintenanceReport(spark, root)
    assert(rep.annRecall.isEmpty)
    assert(!rep.recommendations.exists(_.startsWith("rebuild_ann:")))
    // a CORRUPT record (name listed, geometry unparseable) is a logged
    // per-tick skip — later registrations must NOT rewrite it away
    val v = VersionedTable.setProperties(spark, root, Map(
      AnnIndexes.IndexesProp -> "broken,ghost",
      "graft.ann.broken.kind" -> "no-such-kind"))
    assert(v > 0)
    AnnIndexes.register(spark, root, AnnIndexes.AnnIndexSpec(
      name = "fresh", kind = "ivf",
      table = "graft_annm_fresh", path = "/nowhere2",
      idCol = "vec_id", vecCol = "embedding",
      k = 5, nCells = 16, nProbes = 3))
    val cur = VersionedTable.currentVersion(spark, root).get
    val names = VersionedTable.propertiesOf(spark, root, cur)(
      AnnIndexes.IndexesProp)
    assert(names.split(',').toSet == Set("broken", "fresh", "ghost"),
      s"register must preserve the unparseable name: $names")
  }
}
