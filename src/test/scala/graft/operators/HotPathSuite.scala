package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class HotPathSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("reliable-checkpoint mode is a drop-in for the default localCheckpoint pin") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", "I", 1L), (1L, "a2", "U", 2L),
      (2L, "b", "D", 1L), (2L, "b2", "I", 2L),
      (3L, "c", "I", 1L)
    ).toDF("id", "v", "__graft_op", "__graft_ord")

    def run(): (Set[(Long, String)], Set[Long]) = {
      val (data, dels) = CdcOps.resolveBatch(df, Seq("id"))
      (data.select("id", "v").as[(Long, String)].collect().toSet,
        dels.select("id").as[Long].collect().toSet)
    }

    val base = run()
    val dir = TestSpark.freshDir("hotpath-ckpt")
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set(HotPath.ReliableConf, "true")
    try {
      assert(run() === base)
      // blocks live on the cluster FS now, not executor memory
      assert(ControlFsCompat.nonEmpty(dir))
    } finally spark.conf.unset(HotPath.ReliableConf)
  }

  test("spreadIfNarrow widens a narrow scan-shaped frame and only then") {
    import spark.implicits._
    val target = spark.sparkContext.defaultParallelism

    // narrow scan shape (one-partition local frame) → repartitioned
    val narrow = Seq.tabulate(100)(i => (i.toLong, s"t$i")).toDF("id", "text")
      .repartition(1).localCheckpoint() // pin so the frame ARRIVES 1-partition, plan scan-shaped
    val spread = HotPath.spreadIfNarrow(narrow)
    assert(spread.rdd.getNumPartitions === target)
    // row set untouched
    assert(spread.as[(Long, String)].collect().toSet ===
      narrow.as[(Long, String)].collect().toSet)

    // already-parallel input → the SAME frame back, no extra exchange
    val wide = Seq.tabulate(100)(i => (i.toLong, s"t$i")).toDF("id", "text")
      .repartition(target + 4).localCheckpoint()
    assert(HotPath.spreadIfNarrow(wide) eq wide)

    // exchange-shaped plans (aggregate here) pass through UNTOUCHED even
    // when their partition count would be low — the probe must not
    // execute upstream shuffle stages (see scaladoc)
    val agged = narrow.groupBy("id").count()
    assert(HotPath.spreadIfNarrow(agged) eq agged)
  }
}

/** Tiny local helper so the suite doesn't reach into graft.fs privates. */
private object ControlFsCompat {
  def nonEmpty(dir: String): Boolean = {
    val d = new java.io.File(dir)
    d.exists && d.listFiles != null && d.listFiles.nonEmpty
  }
}
