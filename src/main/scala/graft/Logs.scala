package graft

/** Targeted log hygiene for the harness mains.
  *
  * Several operators intentionally run an UNPARTITIONED window over a
  * tiny post-aggregation frame (GlobalOrder's ≤ tiers×256 offsets, the
  * salted-top-k final rank over ≤ k·32 survivors). WindowExec warns on
  * every such task — hundreds of identical lines per run — drowning
  * the one-line bench JSON and any real warning in the artifact tails.
  * Raising just that logger to ERROR keeps every other WARN visible.
  */
object Logs {
  def quietNoise(): Unit =
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    catch { case _: Throwable => () } // never let log plumbing kill a run
}
