package graft.llm

import org.apache.spark.sql.SparkSession

/** Shared layout helpers for the persisted-index family (crash-atomic
  * generation publishing: data tables stage under `gen-*`, the meta row
  * commits the generation LAST — see [[Search.buildIndex]] /
  * [[Decontaminate.buildIndex]]).
  *
  * All filesystem work goes through HADOOP's filesystem layer, like the
  * parquet tables themselves — java.nio paths resolve against the
  * driver's local disk, so on a cluster default FS (hdfs://, s3a://) a
  * java.nio sweep silently never deletes anything and every rebuild's
  * full n-gram/postings table accumulates forever.
  */
private[llm] object IndexLayout {

  def newGeneration(): String = s"gen-${java.util.UUID.randomUUID().toString.take(8)}"

  /** The generation the CURRENT meta row points at, or None when no
    * readable meta exists — what a rebuild passes to [[sweepGenerations]]
    * as the spare to protect.
    */
  def publishedGen(spark: SparkSession, dir: String): Option[String] =
    try {
      val m = spark.read.parquet(s"$dir/meta.parquet")
      if (m.columns.contains("gen")) Option(m.select("gen").head().getString(0)) else None
    } catch { case _: Exception => None }

  /** Delete superseded `gen-*` dirs, keeping the just-published
    * generation and `prevPublished` — the generation an in-flight probe
    * that resolved the PREVIOUS meta row may still be scanning (the
    * [[IvfIndex]] keep-one-generation rule). The spare is named
    * EXPLICITLY by the caller (it read the old meta before rebuilding):
    * a newest-by-mtime heuristic let a crash ORPHAN (data written, meta
    * never committed) displace the genuinely published previous
    * generation, deleting it out from under exactly the reader the
    * spare slot exists to protect. Orphans are reclaimed here instead.
    */
  def sweepGenerations(
      spark: SparkSession,
      dir: String,
      keep: String,
      prevPublished: Option[String]): Unit = {
    val d = new org.apache.hadoop.fs.Path(dir)
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(d)) return
    val keepSet = Set(keep) ++ prevPublished
    fs.listStatus(d).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("gen-") && !keepSet.contains(name)) {
        fs.delete(st.getPath, true)
        ()
      }
    }
  }
}
