package graft

import org.apache.spark.sql.SparkSession

/** Canonical session builder (SURVEY.md §4): UTC, AQE on, graft SQL
  * functions registered via extensions, sized shuffle parallelism. The
  * same configuration scales from local[n] testing to a cluster by
  * swapping master/partitions — no code change in the operators.
  */
object GraftSession {

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")

  /** local[cpus] session with shuffle parallelism = cpus. */
  def local(cpus: Int): SparkSession = {
    val s = builder(s"local[$cpus]", cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
