package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** REGISTRATION of persisted ANN indexes against their source table —
  * the wiring that lets the maintenance loop close over similarity
  * search: [[Similarity.driftReport]] can MEASURE a drifted index and
  * [[Similarity]]'s `build*Index` can REBUILD one, but without a
  * record of which indexes derive from which table, `MAINTAIN` can
  * never dispatch either. The record is TABLE PROPERTIES on the source
  * [[VersionedTable]] (`graft.ann.indexes` lists the names; the
  * geometry of index `i` lives under `graft.ann.<i>.*`), so it commits,
  * time-travels, clones and restores with the table — exactly how the
  * partition spec and clustering are carried.
  *
  * The loop, end to end: `register` once after a `build*Index`;
  * [[VersionedTable.maintenanceReport]] then measures every registered
  * index per tick (recall@k against brute-force ground truth on a
  * deterministic sample — the faiss operating rule, measured not
  * guessed) and recommends `rebuild_ann:<name>` when recall falls under
  * the floor; [[VersionedTable.applyMaintenance]] dispatches the verb
  * back here, which re-trains the geometry on the CURRENT corpus and
  * overwrites the index tables in place (build* writes are
  * SaveMode.Overwrite, so probes atomically see the new geometry).
  *
  * At 100 TB the drift probe's cost is the stated O(sample x corpus)
  * of a measured recall — sized by `sampleEvery`, run per ingest epoch
  * with the rest of the maintenance tick, never per query. */
object AnnIndexes {

  /** Comma-separated registered index names on the source table. */
  val IndexesProp = "graft.ann.indexes"

  private def prop(name: String, field: String) = s"graft.ann.$name.$field"

  /** Everything a rebuild/drift needs to re-derive an index from its
    * source table. `kind`: `ivf` (bucketed postings), `pq` (codes +
    * codebooks), `ivfpq` (coarse cells over PQ codes), `ivfpq_res`
    * (coarse cells over residual-encoded PQ codes — faiss
    * `by_residual=true`). `pqGeom` = (nSub, subDim, kPerSub, shortlist)
    * for the PQ kinds. */
  final case class AnnIndexSpec(
      name: String,
      kind: String,
      table: String,
      path: String,
      idCol: String,
      vecCol: String,
      k: Int,
      nCells: Int = 0,
      nProbes: Int = 0,
      nBuckets: Int = 8,
      coarseIters: Int = 0,
      pqGeom: Option[(Int, Int, Int, Int)] = None,
      pqIters: Int = 0,
      recallFloor: Double = 0.9,
      sampleEvery: Int = 100) {
    require(Set("ivf", "pq", "ivfpq", "ivfpq_res").contains(kind),
      s"unknown ANN index kind '$kind' (ivf | pq | ivfpq | ivfpq_res)")
    require(kind == "ivf" || pqGeom.isDefined,
      s"kind '$kind' needs pqGeom = (nSub, subDim, kPerSub, shortlist)")
    require(kind == "pq" || nCells > 0, s"kind '$kind' needs nCells")
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit || c == '_'),
      s"index name must be alphanumeric/underscore: $name")
  }

  /** Record `spec` on the source table (merge-commit via
    * [[VersionedTable.setProperties]]); re-registering a name replaces
    * its geometry record. Returns the new table version. */
  def register(spark: SparkSession, root: String, spec: AnnIndexSpec): Long = {
    // RAW names, not registered(): a record that fails to parse is a
    // per-tick logged skip, and rewriting the name list from the parsed
    // view would silently unregister it forever
    val names = (rawNames(spark, root).toSet + spec.name).toSeq.sorted
    val geom = Map(
      prop(spec.name, "kind") -> spec.kind,
      prop(spec.name, "table") -> spec.table,
      prop(spec.name, "path") -> spec.path,
      prop(spec.name, "idCol") -> spec.idCol,
      prop(spec.name, "vecCol") -> spec.vecCol,
      prop(spec.name, "k") -> spec.k.toString,
      prop(spec.name, "nCells") -> spec.nCells.toString,
      prop(spec.name, "nProbes") -> spec.nProbes.toString,
      prop(spec.name, "nBuckets") -> spec.nBuckets.toString,
      prop(spec.name, "coarseIters") -> spec.coarseIters.toString,
      prop(spec.name, "pqIters") -> spec.pqIters.toString,
      prop(spec.name, "recallFloor") -> spec.recallFloor.toString,
      prop(spec.name, "sampleEvery") -> spec.sampleEvery.toString) ++
      spec.pqGeom.map(g =>
        prop(spec.name, "pq") -> s"${g._1},${g._2},${g._3},${g._4}").toMap
    VersionedTable.setProperties(spark, root,
      geom + (IndexesProp -> names.mkString(",")))
  }

  /** Drop `name`'s registration (the index tables stay — external-table
    * semantics, like DROP TABLE on a catalog pointer). */
  def unregister(spark: SparkSession, root: String, name: String): Long = {
    val remaining = rawNames(spark, root).filterNot(_ == name)
    val geomKeys = Seq("kind", "table", "path", "idCol", "vecCol", "k",
      "nCells", "nProbes", "nBuckets", "coarseIters", "pqIters",
      "recallFloor", "sampleEvery", "pq").map(prop(name, _))
    if (remaining.isEmpty) {
      VersionedTable.unsetProperties(spark, root, geomKeys :+ IndexesProp)
    } else {
      VersionedTable.setProperties(spark, root,
        Map(IndexesProp -> remaining.sorted.mkString(",")))
      VersionedTable.unsetProperties(spark, root, geomKeys)
    }
  }

  /** Every name in the registry property, parseable or not — what
    * register/unregister rewrite the list from. */
  private def rawNames(spark: SparkSession, root: String): Seq[String] =
    VersionedTable.currentVersion(spark, root).toSeq.flatMap { v =>
      VersionedTable.propertiesOf(spark, root, v).get(IndexesProp).toSeq
        .flatMap(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
    }

  /** The indexes registered on `root`'s CURRENT version. Records with
    * missing/corrupt geometry are skipped (a maintenance tick must not
    * die on one bad property), not silently half-parsed. */
  def registered(spark: SparkSession, root: String): Seq[AnnIndexSpec] =
    VersionedTable.currentVersion(spark, root).toSeq.flatMap { v =>
      val props = VersionedTable.propertiesOf(spark, root, v)
      props.get(IndexesProp).toSeq
        .flatMap(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
        .flatMap { name =>
          def f(field: String) = props.get(prop(name, field))
          try Some(AnnIndexSpec(
            name = name,
            kind = f("kind").get,
            table = f("table").get,
            path = f("path").get,
            idCol = f("idCol").get,
            vecCol = f("vecCol").get,
            k = f("k").get.toInt,
            nCells = f("nCells").map(_.toInt).getOrElse(0),
            nProbes = f("nProbes").map(_.toInt).getOrElse(0),
            nBuckets = f("nBuckets").map(_.toInt).getOrElse(8),
            coarseIters = f("coarseIters").map(_.toInt).getOrElse(0),
            pqGeom = f("pq").map { s =>
              val a = s.split(',').map(_.trim.toInt)
              (a(0), a(1), a(2), a(3))
            },
            pqIters = f("pqIters").map(_.toInt).getOrElse(0),
            recallFloor = f("recallFloor").map(_.toDouble).getOrElse(0.9),
            sampleEvery = f("sampleEvery").map(_.toInt).getOrElse(100)))
          catch {
            case e: Exception =>
              log.warn(s"skipping unparseable ANN index record '$name' " +
                s"on $root: ${e.getMessage}")
              None
          }
        }
    }

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Measure `spec`'s index against the CURRENT corpus of `root` —
    * [[Similarity.driftReport]] for the IVF kinds; the PQ-only kind
    * measures through [[Similarity.probePqIndex]] with the same
    * deterministic query sample and ground truth. */
  def drift(spark: SparkSession, root: String,
      spec: AnnIndexSpec): Similarity.DriftReport = {
    val corpus = VersionedTable.read(spark, root)
    spec.kind match {
      case "ivf" =>
        Similarity.driftReport(spark, spec.table, corpus, spec.idCol,
          spec.vecCol, spec.k, spec.nCells, spec.nProbes,
          spec.recallFloor, spec.sampleEvery, pq = None)
      case "ivfpq" =>
        Similarity.driftReport(spark, spec.table, corpus, spec.idCol,
          spec.vecCol, spec.k, spec.nCells, spec.nProbes,
          spec.recallFloor, spec.sampleEvery, pq = spec.pqGeom)
      case "ivfpq_res" =>
        val Some((nSub, subDim, kPerSub, shortlist)) = spec.pqGeom
        Similarity.measureDrift(spark, spec.table, corpus, spec.idCol,
          spec.vecCol, spec.k, spec.recallFloor, spec.sampleEvery) { queries =>
          Similarity.probeIvfPqResidualIndex(spark, spec.table, queries,
            corpus, spec.idCol, spec.vecCol, spec.k, spec.nProbes,
            nSub, subDim, kPerSub, shortlist)
        }
      case "pq" =>
        val Some((nSub, subDim, kPerSub, shortlist)) = spec.pqGeom
        Similarity.measureDrift(spark, spec.table, corpus, spec.idCol,
          spec.vecCol, spec.k, spec.recallFloor, spec.sampleEvery) { queries =>
          Similarity.probePqIndex(spark, spec.table, queries, corpus,
            spec.idCol, spec.vecCol, spec.k, nSub, subDim, kPerSub, shortlist)
        }
    }
  }

  /** RE-TRAIN `spec`'s geometry on the current corpus and overwrite the
    * index tables in place — what `MAINTAIN` dispatches for a
    * `rebuild_ann:<name>` recommendation. Identical output to a fresh
    * `build*Index` with the same parameters (the builds ARE the fresh
    * builds — SaveMode.Overwrite on the same table/path). */
  def rebuild(spark: SparkSession, root: String, spec: AnnIndexSpec): Unit = {
    val corpus = VersionedTable.read(spark, root)
    spec.kind match {
      case "ivf" =>
        Similarity.buildIvfIndex(corpus, spec.idCol, spec.vecCol,
          spec.nCells, spec.table, spec.path, spec.nBuckets,
          kmeansIters = spec.coarseIters)
      case "pq" =>
        val Some((nSub, subDim, kPerSub, _)) = spec.pqGeom
        Similarity.buildPqIndex(corpus, spec.idCol, spec.vecCol,
          nSub, subDim, kPerSub, spec.pqIters, spec.table, spec.path)
      case "ivfpq" =>
        val Some((nSub, subDim, kPerSub, _)) = spec.pqGeom
        Similarity.buildIvfPqIndex(corpus, spec.idCol, spec.vecCol,
          spec.nCells, spec.coarseIters, nSub, subDim, kPerSub,
          spec.pqIters, spec.table, spec.path, spec.nBuckets)
      case "ivfpq_res" =>
        val Some((nSub, subDim, kPerSub, _)) = spec.pqGeom
        Similarity.buildIvfPqResidualIndex(corpus, spec.idCol, spec.vecCol,
          spec.nCells, spec.coarseIters, nSub, subDim, kPerSub,
          spec.pqIters, spec.table, spec.path, spec.nBuckets)
    }
  }
}
