package graft

import java.nio.file.{Files, Path}

/** Per-process scratch directories for the round-trip operators
  * (CSV/JSON sinks, partitioned writes, stream checkpoints). Each dir is
  * registered with a single JVM shutdown hook that deletes it, so
  * repeated Verify/Bench runs no longer accumulate temp directories. */
object Scratch {
  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    dirs.forEach { d =>
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(d.toFile)
    }
  }))

  /** Create a tracked scratch directory; deleted at JVM exit. */
  def dir(prefix: String): String = {
    val d = Files.createTempDirectory(prefix)
    dirs.add(d)
    d.toString
  }
}
