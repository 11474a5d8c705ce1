package graft.operators

/** Per-process temp slots for oracle-row fixture tables/indexes.
  *
  * The hermeticity contract (the round-11 lesson, first fixed for
  * TextIndex artifacts): a query row that BUILDS a table on disk must
  * never share that path with another harness process. The old pattern
  * — a fixed `/tmp/graft-xxx-<hex(dir.hashCode)>` slot — let a
  * concurrent or stale verify/bench process rebuild the same TxLog
  * table while this process was mid-lifecycle; TxLog's append∥append
  * OCC *commutes* rather than aborts, so the raced folds silently
  * inflated counts while keeping row-count and schema green
  * (CORRECTNESS_r11's one red row, `qw_mv_refresh`).
  *
  * Each (JVM, logical key) gets a real `Files.createTempDirectory`
  * slot: unique per process (no cross-process sharing, and distinct
  * keys can never collide the way a String.hashCode slot could),
  * reused across invocations within the process (repeated bench reps
  * exercise the destroy→rebuild path without leaking a tree per run),
  * removed by a shutdown hook (no leak at exit). */
object Fixtures {
  private val slots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** A per-process directory slot for fixture `name` scoped to scale
    * dir `d`. The returned path exists. */
  def dir(name: String, d: String): String = {
    val key = name + "|" + java.nio.file.Paths.get(d).toAbsolutePath.toString
    slots.computeIfAbsent(key, _ => {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft-$name-")
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(); ()
        }
        rm(tmp.toFile)
      }))
      tmp.toString
    })
  }

  /** A table path UNDER the per-process slot (TxLog wants a directory
    * it owns — give each logical table its own child of the slot). */
  def table(name: String, d: String, child: String): String =
    dir(name, d) + "/" + child
}
