package graft.io

/** Per-invocation scratch directories that clean themselves up at JVM
  * exit — repeated gate/bench runs would otherwise accumulate a full
  * copy of their staged inputs, checkpoints, and sink outputs in
  * java.io.tmpdir until the disk fills.
  */
object Scratch {

  def dir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteTree(p.toFile)))
    p.toString
  }

  private def deleteTree(f: java.io.File): Unit =
    try {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(deleteTree)
      f.delete()
      ()
    } catch { case _: Throwable => () }
}
