package graft.sink

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the r19 fan-out write floor plumbing: the scoped AQE
  * min-partition-size override applies inside the write body and is
  * restored afterwards — including restore-to-unset, the state every
  * fresh session starts in — and the floor honors the
  * `spark.graft.write.fanout.minPartitionSize` conf.
  */
class FanoutFloorSuite extends AnyFunSuite {
  private val Key = "spark.sql.adaptive.coalescePartitions.minPartitionSize"

  test("floor applies inside the body and restores the effective value") {
    val spark = TestSpark.spark
    spark.conf.unset(Key)
    // note: getOption on a registered conf returns its DEFAULT ("1048576b")
    // even when unset, so "prior value" below is the default — restore
    // re-sets the same effective value rather than unsetting
    val prior = spark.conf.get(Key)
    var inside: Option[String] = None
    IceTableWriter.withFanoutCoalesceFloor(spark) {
      inside = spark.conf.getOption(Key)
    }
    assert(inside === Some(IceTableWriter.FanoutMinPartitionSizeDefault))
    assert(spark.conf.get(Key) === prior, "restore must preserve the effective value")
  }

  test("floor restores a previously set conf and honors the graft override") {
    val spark = TestSpark.spark
    spark.conf.set(Key, "2MB")
    spark.conf.set(IceTableWriter.FanoutMinPartitionSizeConf, "128KB")
    try {
      var inside: Option[String] = None
      IceTableWriter.withFanoutCoalesceFloor(spark) {
        inside = spark.conf.getOption(Key)
      }
      assert(inside === Some("128KB"), "the graft conf overrides the default floor")
      assert(spark.conf.get(Key) === "2MB", "prior value must be restored")
    } finally {
      spark.conf.unset(Key)
      spark.conf.unset(IceTableWriter.FanoutMinPartitionSizeConf)
    }
  }

  test("floor is restored when the body throws") {
    val spark = TestSpark.spark
    spark.conf.unset(Key)
    val prior = spark.conf.get(Key)
    intercept[RuntimeException] {
      IceTableWriter.withFanoutCoalesceFloor(spark)(throw new RuntimeException("boom"))
    }
    assert(spark.conf.get(Key) === prior)
  }
}
