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
}

/** Tiny local helper so the suite doesn't reach into graft.fs privates. */
private object ControlFsCompat {
  def nonEmpty(dir: String): Boolean = {
    val d = new java.io.File(dir)
    d.exists && d.listFiles != null && d.listFiles.nonEmpty
  }
}
