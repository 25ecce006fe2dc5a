package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.config.{EngineConfig, TableConfig}
import graft.table.IceTable

case class Ev(event_id: Long, user_id: Long, event_type: String, value: Double)

/** K1-K12 streaming shell: micro-batches from a MemoryStream drive the
  * same Ingest pipeline; each trigger = one commit (the reference's
  * commit-interval semantics with the coordinator collapsed into the
  * driver).
  */
class StreamingSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming ingest commits one snapshot per micro-batch with offsets checkpointed") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val wh = TestSpark.freshDir("stream-wh")
    val ckpt = TestSpark.freshDir("stream-ckpt")
    val cfg = EngineConfig(warehouse = wh,
      tables = Seq(TableConfig("sink")), autoCreate = true)

    val ms = MemoryStream[Ev]
    val q = IngestStream.start(ms.toDF(), cfg, ckpt, triggerMs = Some(50))
    try {
      ms.addData(Ev(1, 10, "click", 1.0), Ev(2, 11, "view", 2.0))
      q.processAllAvailable()
      ms.addData(Ev(3, 12, "click", 3.0))
      q.processAllAvailable()
    } finally q.stop()

    val t = IceTable.load(s"$wh/sink")
    assert(t.read(spark).count() === 3)
    assert(t.log.commits().map(_.batchId) === Seq(0L, 1L))
    // checkpoint exists for restart recovery (S4/K4 parity)
    assert(new java.io.File(s"$ckpt/offsets").list().nonEmpty)
  }

  test("restart from checkpoint resumes without duplicating commits (S4/K8)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val wh = TestSpark.freshDir("stream-restart")
    val ckpt = TestSpark.freshDir("stream-restart-ckpt")
    val cfg = EngineConfig(warehouse = wh,
      tables = Seq(TableConfig("sink")), autoCreate = true)

    val ms1 = MemoryStream[Ev]
    val q1 = IngestStream.start(ms1.toDF(), cfg, ckpt, triggerMs = Some(50))
    try {
      ms1.addData(Ev(1, 10, "click", 1.0), Ev(2, 11, "view", 2.0))
      q1.processAllAvailable()
    } finally q1.stop()

    // second incarnation, same source + checkpoint: batch ids continue,
    // nothing replays
    ms1.addData(Ev(3, 12, "click", 3.0))
    val q2 = IngestStream.start(ms1.toDF(), cfg, ckpt, triggerMs = Some(50))
    try q2.processAllAvailable()
    finally q2.stop()

    val t = IceTable.load(s"$wh/sink")
    assert(t.read(spark).select("event_id").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
    // distinct, monotonically increasing batch ids — no duplicated commit
    val batchIds = t.log.commits().map(_.batchId)
    assert(batchIds === batchIds.distinct.sorted)
    // replaying an already-committed batch id is fenced by the guard (K8)
    val before = t.log.commits().size
    graft.sink.Ingest.run(spark, Seq(Ev(99, 99, "click", 9.9)).toDF(), batchIds.last, cfg)
    assert(IceTable.load(s"$wh/sink").log.commits().size === before)
  }

  test("commit-lifecycle listener reports started/commit-complete/terminated (K12)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val wh = TestSpark.freshDir("stream-listener")
    val ckpt = TestSpark.freshDir("stream-listener-ckpt")
    val cfg = EngineConfig(warehouse = wh,
      tables = Seq(TableConfig("sink")), autoCreate = true)

    val events = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new IngestStream.CommitListener(events.add(_))
    spark.streams.addListener(listener)
    val ms = MemoryStream[Ev]
    val q = IngestStream.start(ms.toDF(), cfg, ckpt, triggerMs = Some(50))
    try {
      ms.addData(Ev(1, 10, "click", 1.0))
      q.processAllAvailable()
      ms.addData(Ev(2, 11, "view", 2.0))
      q.processAllAvailable()
      q.stop()
      q.awaitTermination(10000)
      // listener events are delivered async — settle briefly
      val deadline = System.currentTimeMillis() + 10000
      def lines = events.toArray(Array.empty[String]).toSeq
      while (System.currentTimeMillis() < deadline &&
        !lines.exists(_.contains("\"terminated\""))) Thread.sleep(100)
      assert(lines.exists(_.contains(s"""{"event":"started","id":"${q.id}"""")))
      // one commit-complete line per non-empty micro-batch, with row counts
      val commits = lines.filter(_.contains("\"commit-complete\""))
      assert(commits.exists(l => l.contains("\"batchId\":0") && l.contains("\"rows\":1")))
      assert(commits.exists(l => l.contains("\"batchId\":1") && l.contains("\"rows\":1")))
      assert(lines.exists(_.contains(s"""{"event":"terminated","id":"${q.id}"""")))
    } finally {
      if (q.isActive) q.stop()
      spark.streams.removeListener(listener)
    }
  }

  test("streaming CDC upsert: per-batch last-wins merge into the table") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val wh = TestSpark.freshDir("stream-cdc")
    val ckpt = TestSpark.freshDir("stream-cdc-ckpt")
    val cfg = EngineConfig(warehouse = wh,
      tables = Seq(TableConfig("state", idColumns = Seq("user_id"))),
      cdcField = Some("event_type"), autoCreate = true)
    // event_type doubles as the op code here: I/U/D
    val ms = MemoryStream[Ev]
    val q = IngestStream.start(ms.toDF(), cfg, ckpt, triggerMs = Some(50))
    try {
      ms.addData(Ev(1, 100, "I", 1.0), Ev(2, 200, "I", 2.0))
      q.processAllAvailable()
      ms.addData(Ev(3, 100, "U", 9.0), Ev(4, 200, "D", 0.0))
      q.processAllAvailable()
    } finally q.stop()

    val rows = IceTable.load(s"$wh/state").read(spark)
      .select("user_id", "value").as[(Long, Double)].collect().toSet
    assert(rows === Set((100L, 9.0)))
  }
}
