package graft

import java.nio.file.{Files, Path}

/** Temp output dirs for query-internal sinks (streaming changelogs,
  * ETL round-trip snapshots), deleted on JVM exit.
  *
  * Bench runs every query several times and each invocation writes a
  * fresh dir — at sf10 the st02 session parquet alone is millions of
  * rows, so leaving them behind accumulates gigabytes in the host tmpdir
  * across campaigns. A shutdown hook bounds the footprint to one JVM's
  * worth; dirs stay unique per invocation so concurrent sessions (driver
  * verify + builder bench) never clobber each other.
  */
object TempDirs {
  private val created = new java.util.concurrent.ConcurrentLinkedQueue[Path]

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    created.forEach { root =>
      try {
        Files.walk(root).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.deleteIfExists(p))
      } catch { case _: Throwable => () } // best-effort: tmpdir cleanup
    }
  }))

  /** Create a unique temp dir removed at JVM shutdown. */
  def create(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p.toString
  }
}
