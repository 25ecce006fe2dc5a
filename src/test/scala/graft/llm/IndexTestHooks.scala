package graft.llm

import graft.fs.ControlFs

/** Test-only hooks into the index family's meta-pointer protocol
  * ([[IndexLayout.publishMeta]]).
  */
object IndexTestHooks {

  /** Path of the CURRENTLY committed 1-row meta table (what the pre-r15
    * tests read as `dir/meta.parquet`).
    */
  def metaPath(dir: String): String =
    IndexLayout.metaTablePath(dir).getOrElse(
      throw new IllegalStateException(s"no committed meta under $dir"))

  /** Simulate a crash just BEFORE the meta-pointer commit of the most
    * recent publish: remove the newest `ptr-vN` and its staged
    * `meta-vN.parquet` — exactly the on-disk state a writer that died
    * between staging the meta table and creating the pointer leaves
    * (modulo the staged table itself, whose presence readers ignore
    * without the pointer; removing it too keeps the simulation at the
    * EARLIER crash point, between the data tables and the meta stage).
    */
  def undoLastMetaPublish(dir: String): Unit = {
    val v = IndexLayout.currentMetaVersion(dir).getOrElse(
      throw new IllegalStateException(s"no meta pointer under $dir"))
    ControlFs.delete(s"$dir/ptr-v$v", recursive = false)
    ControlFs.delete(s"$dir/meta-v$v.parquet", recursive = true)
  }

  /** Simulate a crash in the MIDDLE of the pointer create: the file's
    * NAME exists but its content never landed. The protocol commits by
    * name alone, so readers must resolve this pointer normally.
    */
  def tearLastPointerContent(dir: String): Unit = {
    val v = IndexLayout.currentMetaVersion(dir).getOrElse(
      throw new IllegalStateException(s"no meta pointer under $dir"))
    ControlFs.writeSmall(s"$dir/ptr-v$v", "")
  }
}
