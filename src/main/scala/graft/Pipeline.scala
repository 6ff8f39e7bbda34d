package graft

/** Dependency-ordered pipeline runner — the Spark-native counterpart of
  * the reference's Airflow DAG (`dags/retail_hourly_etl.py`: hourly
  * `source_transaction_lion_parcel >> retail_transactions_scd`,
  * max_active_runs=1, fail-propagation). The scheduler-specific pieces
  * (cron cadence, single-flight) belong to whatever runs the driver; what
  * the ENGINE owes the user is deterministic stage ordering, dependency
  * gating, fail-fast skip of downstream stages, and idempotent stages —
  * the last guaranteed by the sinks (atomic truncate-replace, dynamic
  * partition overwrite, keyed upsert), so a retried or re-run pipeline
  * converges to the same state, which is exactly what an hourly
  * `catchup=False` Airflow DAG relies on.
  */
object Pipeline {

  /** One unit of work. `deps` are stage names that must SUCCEED first. */
  final case class Stage(name: String, deps: Seq[String] = Nil)(val body: () => Unit) {
    private[Pipeline] def run(): Unit = body()
  }

  sealed trait Status
  case object Succeeded extends Status
  final case class Failed(error: Throwable) extends Status
  final case class Skipped(failedDep: String) extends Status

  final case class StageResult(name: String, status: Status, seconds: Double)

  /** Run stages in a topological order (stable: declaration order among
    * ready stages). A failed stage fails its transitive dependents as
    * Skipped; independent stages still run. Throws on unknown deps or
    * cycles BEFORE running anything — a malformed DAG should not half-run. */
  def run(stages: Seq[Stage]): Seq[StageResult] = {
    val byName = stages.map(s => s.name -> s).toMap
    require(byName.size == stages.size, "duplicate stage names")
    stages.foreach(s => s.deps.foreach(d =>
      require(byName.contains(d), s"stage '${s.name}' depends on unknown stage '$d'")))

    // Kahn's algorithm, declaration-order stable
    val order = scala.collection.mutable.ArrayBuffer.empty[Stage]
    val done = scala.collection.mutable.Set.empty[String]
    var remaining = stages
    while (remaining.nonEmpty) {
      val (ready, blocked) = remaining.partition(_.deps.forall(done))
      require(ready.nonEmpty,
        s"dependency cycle among: ${blocked.map(_.name).mkString(", ")}")
      ready.foreach { s => order += s; done += s.name }
      remaining = blocked
    }

    val results = scala.collection.mutable.LinkedHashMap.empty[String, StageResult]
    def failedRoot(s: Stage): Option[String] =
      s.deps.find(d => results(d).status match {
        case Succeeded => false
        case _ => true
      })
    order.foreach { s =>
      failedRoot(s) match {
        case Some(dep) =>
          results(s.name) = StageResult(s.name, Skipped(dep), 0.0)
        case None =>
          val t0 = System.nanoTime()
          val status =
            try { s.run(); Succeeded }
            catch { case e: Throwable => Failed(e) }
          results(s.name) = StageResult(s.name, status, (System.nanoTime() - t0) / 1e9)
      }
    }
    results.values.toSeq
  }
}
