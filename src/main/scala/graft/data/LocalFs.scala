package graft.data

/** Local-filesystem helpers shared by fixture and staging plumbing. */
object LocalFs {

  /** Recursively delete a file or directory tree; missing paths are a
    * no-op. (`File.deleteOnExit` silently leaves non-empty directories,
    * so staging code deletes explicitly.) */
  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(deleteRecursively))
    val _ = f.delete()
  }
}
