package graft.queries

import org.apache.spark.sql.SparkSession

/** Session-scoped, dir-keyed memoized builds of on-disk artifacts, with
  * dead-session sweeping — the ONE lifecycle behind every ingest-time
  * table the bench pre-materializes (bucketed q50 tables, q47/q48 media
  * payloads); previously each caller carried its own copy of this
  * machinery and the two had to be kept in sync by hand.
  *
  *  - the build TAG is a JVM-wide counter, injective by construction
  *    (string-derived tags can collide across dirs and silently serve
  *    wrong data)
  *  - WEAK session keys: a strong map would pin every stopped session
  *    forever in a long-lived JVM
  *  - one temp root per JVM (no cross-process clobbering under a shared
  *    path); growth bound: one copy per LIVE (session, dir) pair —
  *    every build first sweeps copies whose owning session stopped, so
  *    a JVM that recreates sessions over the same dir (test suites,
  *    notebooks) reclaims dead copies instead of accumulating them
  */
private[queries] final class SessionScopedBuilds[V](label: String) {

  private val perSession =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Map[String, V]]()
  private var tag = 0
  lazy val base: String =
    java.nio.file.Files.createTempDirectory(label).toString
  private val copies = scala.collection.mutable.ListBuffer
    .empty[(java.lang.ref.WeakReference[SparkSession], Seq[String])]

  private def sweep(): Unit =
    copies.filterInPlace { case (ref, paths) =>
      val owner = ref.get()
      val dead = owner == null || owner.sparkContext.isStopped
      if (dead) paths.foreach { p =>
        try {
          val root = java.nio.file.Paths.get(p)
          if (java.nio.file.Files.exists(root))
            java.nio.file.Files.walk(root)
              .sorted(java.util.Comparator.reverseOrder())
              .forEach(f => java.nio.file.Files.deleteIfExists(f))
        // best effort, NonFatal: Files.walk surfaces concurrent
        // modification of the dead tree as UncheckedIOException (a
        // RuntimeException) — cleanup of another session's garbage must
        // never abort the CURRENT session's build
        } catch { case scala.util.control.NonFatal(_) => () }
      }
      !dead
    }

  /** Memoized build for `(s, dir)`: `build(freshTag)` returns the value
    * plus the on-disk paths to reclaim once `s` stops. A build that
    * throws registers nothing (the caller owns partial-state cleanup,
    * e.g. dropping a half-registered catalog table). Synchronized
    * coarsely — builds are rare ingest-time work.
    */
  def getOrBuild(s: SparkSession, dir: String)
                (build: String => (V, Seq[String])): V = synchronized {
    val m = {
      val existing = perSession.get(s)
      if (existing != null) existing
      else {
        val fresh = scala.collection.mutable.Map.empty[String, V]
        perSession.put(s, fresh)
        fresh
      }
    }
    m.getOrElseUpdate(dir, {
      sweep()
      tag += 1
      val (v, paths) = build(tag.toString)
      copies += ((new java.lang.ref.WeakReference(s), paths))
      v
    })
  }
}
