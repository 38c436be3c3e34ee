package graft.operators

/** Process-unique scratch directories for the append-mode gates
  * (q47/q52/q53): unique per process (concurrent bench + verify runs
  * on one host must not share a path) AND removed at JVM exit, so a
  * best-of-N bench loop doesn't leak one populated tree per query per
  * run. */
object TmpDirs {
  def create(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(dir.toFile)
    }))
    dir.toString
  }
}
