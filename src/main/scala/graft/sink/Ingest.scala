package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.config.{EngineConfig, TableConfig}
import graft.operators.{CdcOps, Coercion, Routing}
import graft.schema.{NameMapping => SchemaNameMapping, SchemaEvolution}
import graft.table.{Commit, IceTable, TableMeta}

/** The per-micro-batch ingestion pipeline — Spark-native equivalent of the
  * reference's `IcebergSinkTask.put` data path (§3.1 of SURVEY.md):
  *
  *   batch → SMT transforms → tombstone filter → routing fan-out →
  *   per table: [auto-create → schema evolution → coercion → CDC resolve →
  *   file write → atomic commit (offsets + vtts + batchId guard)]
  *
  * The reference coordinates this across workers with a Kafka control
  * topic and a two-phase commit (`channel/Coordinator.java`); under Spark
  * the driver is the single coordinator and Structured Streaming's
  * checkpoint supplies replay, so only the batchId idempotence guard (K8)
  * and the commit-log write (K9) remain.
  */
object Ingest {

  final case class TableResult(table: String, commit: Option[Commit])

  def run(
      spark: SparkSession,
      batch: DataFrame,
      batchId: Long,
      config: EngineConfig,
      transforms: Seq[DataFrame => DataFrame] = Nil
  ): Seq[TableResult] = {
    // SMT chain (C7-C10 style transforms), then R6 tombstone filter
    val transformed = transforms.foldLeft(batch)((d, t) => t(d))
    val filtered =
      if (config.tombstoneDrop) Routing.dropTombstones(transformed) else transformed
    val routed = Routing.route(filtered, config)

    // P6 / R1: one cached batch, N table writes
    val multi = routed.size > 1
    if (multi) transformed.persist()
    try {
      val (offsets, vtts) = offsetsAndVtts(transformed)
      if (!multi) {
        routed.map { case (tconf, tdf) =>
          TableResult(tconf.name, writeTable(spark, tdf, batchId, tconf, config, offsets, vtts))
        }
      } else {
        // K10 — multi-table parallel commit (`channel/Coordinator.doCommit
        // :141-168` uses a cores×2 pool); Spark supports concurrent jobs
        // from the driver, so per-table writes overlap their I/O
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(routed.size, Runtime.getRuntime.availableProcessors()))
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
        try {
          val fs = routed.map { case (tconf, tdf) =>
            Future(TableResult(tconf.name,
              writeTable(spark, tdf, batchId, tconf, config, offsets, vtts)))
          }
          Await.result(Future.sequence(fs), Duration.Inf)
        } finally pool.shutdown()
      }
    } finally {
      if (multi) { transformed.unpersist(); () }
    }
  }

  def tablePath(config: EngineConfig, name: String): String =
    s"${config.warehouse}/${name.replace('.', '/')}"

  private def writeTable(
      spark: SparkSession,
      tdf: DataFrame,
      batchId: Long,
      tconf: TableConfig,
      config: EngineConfig,
      offsets: Map[String, Long],
      vtts: Option[Long]
  ): Option[Commit] = {
    val path = tablePath(config, tconf.name)
    val incomingSchema = dataSchema(tdf.schema)

    // P7 — auto-create (schema inferred from the batch, partition spec from
    // config, unpartitioned fallback on error: IcebergWriterFactory:69-117)
    val table: IceTable =
      if (IceTable.exists(path)) IceTable.load(path, tconf.commitBranch)
      else if (config.autoCreate) {
        val createSchema =
          if (config.schemaForceOptional)
            StructType(incomingSchema.fields.map(_.copy(nullable = true)))
          else incomingSchema
        val spec =
          try {
            graft.operators.PartitionTransforms.parseSpec(tconf.partitionBy, createSchema)
            tconf.partitionBy
          } catch { case _: Exception => Nil }
        IceTable.create(path, SchemaEvolution.normalize(createSchema).asInstanceOf[StructType],
          TableMeta(idColumns = tconf.idColumns, partitionBy = spec, format = config.format),
          tconf.commitBranch)
      } else {
        // R3 — unknown table and auto-create off: silently skip
        // (no-op writer parity, IcebergWriterFactory.java:55-62)
        return None
      }

    // E1/E2 — evolve schema from the batch, once, up front
    if (config.evolveSchema) {
      SchemaEvolution
        .evolve(table.schema, incomingSchema, config.schemaCaseInsensitive)
        .foreach(table.evolveTo(_))
    }

    // E4 — `schema.name-mapping.default` table property → alias lookup
    // during projection (RecordConverter.java:100-103,252-271)
    val nameMapping = table.meta.props
      .get("schema.name-mapping.default")
      .map(SchemaNameMapping.parse(_, table.schema))
      .getOrElse(Map.empty[String, Seq[String]])

    val cdcMode = config.cdcField.isDefined || config.upsertMode
    if (cdcMode) {
      val keyCols = if (tconf.idColumns.nonEmpty) tconf.idColumns else config.defaultIdColumns
      val op = CdcOps.opColumn(config.cdcField, config.upsertMode)
      val ord =
        if (tdf.columns.contains("offset")) col("offset").cast("long")
        else monotonically_increasing_id()
      val prepared = tdf.withColumn(CdcOps.OpCol, op).withColumn(CdcOps.OrdCol, ord)
      val coerced = Coercion.project(prepared, table.schema,
        nameMapping = nameMapping,
        caseInsensitive = config.schemaCaseInsensitive,
        extraCols = Seq(CdcOps.OpCol, CdcOps.OrdCol))
      val (data, deleteKeys) = CdcOps.resolveBatch(coerced, keyCols)
      IceTableWriter.delta(spark, data, deleteKeys, table, batchId,
        offsets = offsets, vtts = vtts, maxRecordsPerFile = config.maxRecordsPerFile)
    } else {
      val coerced = Coercion.project(tdf, table.schema,
        nameMapping = nameMapping,
        caseInsensitive = config.schemaCaseInsensitive)
      IceTableWriter.append(spark, coerced, table, batchId,
        offsets = offsets, vtts = vtts, maxRecordsPerFile = config.maxRecordsPerFile)
    }
  }

  /** Schema of the data payload (kafka metadata/bookkeeping cols excluded
    * from auto-create/evolution).
    */
  private def dataSchema(s: StructType): StructType =
    StructType(s.fields.filterNot(f => f.name.startsWith("__graft_")))

  /** S2 + K11 — per-partition next-offset bookkeeping
    * (`channel/Worker.save:89-101`: max offset + 1) and the VTTS watermark
    * (`channel/CommitState.vtts:155-178`: min over partitions of max record
    * timestamp; null if any partition has no timestamp). Computed only for
    * kafka-shaped batches (topic/partition/offset columns present).
    */
  private[graft] def offsetsAndVtts(df: DataFrame): (Map[String, Long], Option[Long]) = {
    val cols = df.columns.toSet
    if (!Set("topic", "partition", "offset").subsetOf(cols)) return (Map.empty, None)
    val hasTs = cols.contains("timestamp")
    val off = col("offset").cast("long")
    val aggCols =
      if (hasTs) Seq(max(off).as("mo"), max(col("timestamp")).as("mt"))
      else Seq(max(off).as("mo"))
    val rows = df.groupBy(col("topic"), col("partition")).agg(aggCols.head, aggCols.tail: _*).collect()
    val offsets = rows.map { r =>
      s"${r.get(0)}-${r.get(1)}" -> (r.getAs[Long]("mo") + 1L)
    }.toMap
    val vtts =
      if (!hasTs || rows.isEmpty || rows.exists(_.isNullAt(rows.head.fieldIndex("mt")))) None
      else {
        val minMax = rows.map(r => r.getAs[java.sql.Timestamp]("mt")).minBy(_.getTime)
        Some(minMax.getTime * 1000L + (minMax.getNanos / 1000) % 1000)
      }
    (offsets, vtts)
  }
}
