package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session entry point for a [[CommitLog]] table that carries
  * LOG-RESIDENT catalog state.
  *
  * [[graft.plans.MatViewCatalog.persist]] and
  * [[graft.plans.ConstraintCatalog.declareAuditedLogged]] write view
  * definitions and audited constraint declarations into the table's own
  * commit log precisely so a FRESH session does not depend on the
  * JVM-global registries surviving — but through round 8 a new session
  * still had to call `restore` by hand per table, which nobody
  * remembers to do. [[open]] closes that gap: the first open of a table
  * in this session restores whatever registrations its log carries
  * (views into the rewrite catalog, constraints into the RI catalog),
  * then reads it like [[CommitLog.read]]. Subsequent opens skip the
  * restore (the props were already loaded; a registration committed
  * AFTER the first open needs [[refresh]]).
  *
  * Restore is metadata-plane (the version file the read resolves
  * anyway), so `open` costs nothing extra at any lake size.
  */
object Lake {

  private val restored =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Read the table at its latest version, auto-restoring its
    * log-resident view and constraint registrations once per session. */
  def open(spark: SparkSession, dir: String): DataFrame = {
    val key = graft.plans.ConstraintCatalog.normalize(dir)
    if (restored.add(key)) {
      // a failed restore must NOT burn the once-per-session slot — drop
      // the mark so a retry restores for real instead of silently
      // serving an unregistered session forever
      try {
        val views = graft.plans.MatViewCatalog.restore(spark, dir)
        val cons = graft.plans.ConstraintCatalog.restore(spark, dir)
        if (views.nonEmpty || cons > 0)
          System.err.println(s"[lake] open $dir restored ${views.size} " +
            s"view(s), $cons constraint declaration(s) from the log")
      } catch { case e: Throwable => restored.remove(key); throw e }
    }
    CommitLog.read(spark, dir)
  }

  /** Force the next [[open]] of `dir` to re-run the restore — for
    * sessions that know a registration landed after their first open
    * (and for spec isolation). */
  def refresh(dir: String): Unit = {
    restored.remove(graft.plans.ConstraintCatalog.normalize(dir)); ()
  }
}
