package graft

/** Targeted log hygiene for the runtime mains (Verify/Bench/Run): the
  * iterative component/dedup operators deliberately unpersist
  * SUPERSEDED localCheckpoint blocks (nothing references them again —
  * spec-pinned), and RDD.unpersist logs a per-RDD WARN ("was locally
  * checkpointed ... cannot be recomputed") for each release. Hundreds
  * of those per run bury real warnings (the same failure mode as the
  * round-3 function-registry spam, VERDICT r03 next #10). This mutes
  * exactly the RDD classes that carry that message, at the mains only
  * — library callers and tests keep full logging. */
object LogQuiet {
  def muteCheckpointReleaseWarns(): Unit = {
    import org.apache.logging.log4j.Level
    import org.apache.logging.log4j.core.config.Configurator
    for (cls <- Seq(
        "org.apache.spark.rdd.MapPartitionsRDD",
        "org.apache.spark.rdd.ParallelCollectionRDD",
        "org.apache.spark.sql.execution.SQLExecutionRDD"))
      Configurator.setLevel(cls, Level.ERROR)
  }
}
