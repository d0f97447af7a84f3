package graft

/** Targeted log hygiene for the runtime mains (Verify/Bench/Run): the
  * iterative component/dedup operators deliberately unpersist
  * SUPERSEDED localCheckpoint blocks (nothing references them again —
  * spec-pinned), and RDD.unpersist logs a per-RDD WARN ("was locally
  * checkpointed ... cannot be recomputed after unpersisting") for each
  * release. Hundreds of those per run bury real warnings (the same
  * failure mode as the round-3 function-registry spam, VERDICT r03
  * next #10).
  *
  * The mute is a MESSAGE-content DENY filter, not a logger-level
  * change: that exact message is only ever emitted by RDD.unpersist on
  * a locally-checkpointed RDD — i.e. precisely the deliberate release
  * — so every other WARN those RDD classes can produce (lost blocks,
  * failed removals) still prints. Installed at the mains only; library
  * callers and tests keep full logging. */
object LogQuiet {
  private val Needle = "was locally checkpointed, its lineage has been truncated"
  @volatile private var installed = false

  def muteCheckpointReleaseWarns(): Unit = synchronized {
    if (installed) return
    import org.apache.logging.log4j.LogManager
    import org.apache.logging.log4j.core.{Filter, LogEvent, LoggerContext}
    import org.apache.logging.log4j.core.filter.AbstractFilter
    LogManager.getContext(false) match {
      case ctx: LoggerContext =>
        val filter = new AbstractFilter(Filter.Result.DENY, Filter.Result.NEUTRAL) {
          override def filter(event: LogEvent): Filter.Result =
            if (event.getMessage != null &&
              event.getMessage.getFormattedMessage.contains(Needle))
              Filter.Result.DENY
            else Filter.Result.NEUTRAL
        }
        filter.start()
        ctx.getConfiguration.getRootLogger.addFilter(filter)
        ctx.updateLoggers()
        installed = true
      case _ => () // non-log4j2-core backend: leave logging untouched
    }
  }
}
