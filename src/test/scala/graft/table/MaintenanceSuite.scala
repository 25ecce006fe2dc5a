package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sink.IceTableWriter

class MaintenanceSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", DoubleType)
  ))

  private def upsert(t: IceTable, batchId: Long, rows: (Long, Double)*): Unit =
    IceTableWriter.delta(
      spark,
      dataDf = rows.toDF("id", "v"),
      deleteKeysDf = rows.map(_._1).toDF("id"),
      table = t,
      batchId = batchId)

  test("auto compacts exactly at the delta-commit threshold and resets the count") {
    val dir = TestSpark.freshDir("maint-auto")
    val t = IceTable.create(dir, schema, TableMeta(idColumns = Seq("id")))
    upsert(t, 0, (1L, 1.0), (2L, 2.0))
    upsert(t, 1, (2L, 2.5), (3L, 3.0))
    assert(t.deltaCommitsSinceCompaction === 2)
    // below threshold: metadata peek only, nothing rewritten
    val no = Maintenance.auto(spark, t, threshold = 3)
    assert(no === Maintenance.TableDecision(2, 3, compacted = false))
    assert(t.deltaCommitsSinceCompaction === 2)
    upsert(t, 2, (1L, 1.5))
    // at threshold: compacts, chain folds, count resets
    val yes = Maintenance.auto(spark, t, threshold = 3)
    assert(yes === Maintenance.TableDecision(3, 3, compacted = true))
    assert(t.deltaCommitsSinceCompaction === 0)
    // state survives the fold: last write per key wins
    val got = t.read(spark).orderBy("id").as[(Long, Double)].collect().toSeq
    assert(got === Seq((1L, 1.5), (2L, 2.5), (3L, 3.0)))
    // the cycle restarts: deltas accumulate again from zero
    upsert(t, 3, (4L, 4.0))
    assert(t.deltaCommitsSinceCompaction === 1)
    assert(!Maintenance.auto(spark, t, threshold = 3).compacted)
  }

  test("plain appends do not count toward the compaction threshold") {
    val dir = TestSpark.freshDir("maint-append")
    val t = IceTable.create(dir, schema, TableMeta(idColumns = Seq("id")))
    IceTableWriter.append(spark, Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"), t, batchId = 0)
    IceTableWriter.append(spark, Seq((3L, 3.0)).toDF("id", "v"), t, batchId = 1)
    assert(t.deltaCommitsSinceCompaction === 0)
    assert(!Maintenance.auto(spark, t, threshold = 1).compacted)
  }

  test("autoIndex no-ops (not crashes) before the index exists") {
    val dir = TestSpark.freshDir("maint-noidx")
    assert(Maintenance.autoIndex(spark, dir, targetCellRows = 10L) ===
      Maintenance.IndexDecision(0L, 0L, rebalanced = false))
  }

  test("autoIndex rebalances only past target occupancy and reports the version change") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dir = TestSpark.freshDir("maint-index")
    graft.llm.IvfIndex.build(emb, "vec_id", "embedding", dir, nCells = 4, kmeansIters = 2)
    val total = spark.read
      .parquet(s"${graft.llm.IvfIndex.activeDir(dir)}/assignments.parquet").count()
    // within target: no-op, geometry version unchanged
    val no = Maintenance.autoIndex(spark, dir, targetCellRows = total)
    assert(no === Maintenance.IndexDecision(4L, 4L, rebalanced = false))
    // past target: re-shards and publishes a new version
    val yes = Maintenance.autoIndex(spark, dir, targetCellRows = math.max(1L, total / 16))
    assert(yes.rebalanced)
    assert(yes.cellsBefore === 4L)
    assert(yes.cellsAfter > 4L)
  }
}
