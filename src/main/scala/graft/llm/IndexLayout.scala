package graft.llm

/** Shared layout helpers for the persisted-index family (crash-atomic
  * generation publishing: data tables stage under `gen-*`, the meta row
  * commits the generation LAST — see [[Search.buildIndex]] /
  * [[Decontaminate.buildIndex]]).
  */
private[llm] object IndexLayout {

  def newGeneration(): String = s"gen-${java.util.UUID.randomUUID().toString.take(8)}"

  /** Delete superseded `gen-*` dirs, keeping the published generation and
    * the newest other one (in-flight probes that resolved the previous
    * meta row mid-probe still find their tables — the [[IvfIndex]]
    * keep-one-generation rule).
    */
  def sweepGenerations(dir: String, keep: String): Unit = {
    import scala.jdk.CollectionConverters._
    val d = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(d)) return
    val gens = {
      val s = java.nio.file.Files.list(d)
      try s.iterator().asScala.toList
        .filter(p => p.getFileName.toString.startsWith("gen-") &&
          p.getFileName.toString != keep)
      finally s.close()
    }
    val spare = gens.sortBy(p => java.nio.file.Files.getLastModifiedTime(p).toMillis)
      .lastOption
    gens.filterNot(spare.contains).foreach { p =>
      val w = java.nio.file.Files.walk(p)
      try w.iterator().asScala.toList.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally w.close()
    }
  }
}
