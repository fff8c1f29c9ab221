package graft.util

/** Local-filesystem helpers for fixture/bench roots. One shared copy:
  * four call sites had grown identical private recursive deletes, and a
  * per-site fix (symlink handling, null listFiles on a vanished dir)
  * would silently miss the other three. */
object LocalFs {
  /** Recursively delete `f` if it exists. Tolerates entries vanishing
    * mid-walk (listFiles returning null) — fixture roots are sometimes
    * cleaned concurrently by the OS tmp reaper. */
  def deleteRecursively(f: java.io.File): Unit = if (f.exists()) {
    if (f.isDirectory) {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(deleteRecursively)
    }
    f.delete(): Unit
  }

  /** Recursive on-disk byte count of `f` (0 for a missing path); same
    * vanished-entry tolerance as [[deleteRecursively]]. */
  def sizeOf(f: java.io.File): Long =
    if (!f.exists()) 0L
    else if (f.isDirectory) {
      val kids = f.listFiles()
      if (kids == null) 0L else kids.map(sizeOf).sum
    } else f.length()
}
