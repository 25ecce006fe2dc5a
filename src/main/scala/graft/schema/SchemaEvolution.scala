package graft.schema

import org.apache.spark.sql.types._

/** E1/E2 — schema-evolution detection and application.
  *
  * Mirrors the reference's rules:
  *  - add column when the incoming batch has a field the table lacks
  *    (`data/RecordConverter.java:165-241` detection)
  *  - widen int→long and float→double only (`data/SchemaUtils
  *    .needsDataTypeUpdate:75-83`)
  *  - required + missing/optional incoming ⇒ make optional
  *    (`SchemaUpdate.MakeOptional`)
  *  - recursive into nested structs (the reference evolves nested fields
  *    through its struct converter)
  *
  * Difference vs reference (documented in SURVEY §7 risk register): the
  * reference evolves mid-record and re-converts; we diff once per
  * micro-batch up front — same resulting table state, one schema commit.
  */
object SchemaEvolution {

  /** Normalize incoming Spark types the way the reference maps Connect
    * types to Iceberg (`data/SchemaUtils.toIcebergType:227-289`):
    * INT8/16 → int; schemaless integrals were already widened to long by
    * Spark's JSON inference (`doInferIcebergType:296-352` parity).
    */
  def normalize(dt: DataType): DataType = dt match {
    case ByteType | ShortType => IntegerType
    case s: StructType        => StructType(s.fields.map(f => f.copy(dataType = normalize(f.dataType))))
    case a: ArrayType         => a.copy(elementType = normalize(a.elementType))
    case m: MapType           => m.copy(keyType = normalize(m.keyType), valueType = normalize(m.valueType))
    case other                => other
  }

  /** Deep-nullable form: IceTable stores every schema fully optional —
    * parquet round-trips drop Spark-level required-ness, and a struct
    * cast cannot re-impose non-nullability on read. (The reference's
    * required/optional tracking surfaces as `schema-force-optional` and
    * the MakeOptional evolution op; physically everything is optional.)
    */
  def deepNullable(dt: DataType): DataType = dt match {
    case s: StructType =>
      StructType(s.fields.map(f => f.copy(dataType = deepNullable(f.dataType), nullable = true)))
    case a: ArrayType => a.copy(elementType = deepNullable(a.elementType), containsNull = true)
    case m: MapType =>
      m.copy(valueType = deepNullable(m.valueType), valueContainsNull = true)
    case o => o
  }

  def widen(current: DataType, incoming: DataType): Option[DataType] =
    (current, incoming) match {
      case (IntegerType, LongType)  => Some(LongType)
      case (FloatType, DoubleType)  => Some(DoubleType)
      case _                        => None
    }

  /** Compute the evolved table schema for an incoming batch schema.
    * Returns None when no change is needed (idempotence check parity,
    * `data/SchemaUtils.applySchemaUpdates:134-148`).
    */
  def evolve(table: StructType, incoming: StructType, caseInsensitive: Boolean = true): Option[StructType] = {
    val evolved = evolveStruct(table, StructType(incoming.fields.map(f => f.copy(dataType = normalize(f.dataType)))), caseInsensitive)
    if (evolved == table) None else Some(evolved)
  }

  private def evolveStruct(table: StructType, in: StructType, ci: Boolean): StructType = {
    def find(s: StructType, name: String): Option[StructField] =
      s.fields.find(_.name == name)
        .orElse(if (ci) s.fields.find(_.name.equalsIgnoreCase(name)) else None)

    // widen / recurse / make-optional existing fields; recursion reaches
    // structs nested inside list elements and map values too
    // (RecordConverterTest missing-column detection for list/map values)
    def evolveType(t: DataType, i: DataType): DataType = (t, i) match {
      case (ts: StructType, is: StructType) => evolveStruct(ts, is, ci)
      case (ta: ArrayType, ia: ArrayType) =>
        ta.copy(elementType = evolveType(ta.elementType, ia.elementType))
      case (tm: MapType, im: MapType) =>
        tm.copy(valueType = evolveType(tm.valueType, im.valueType))
      case _ => widen(t, i).getOrElse(t)
    }
    val updated = table.fields.map { tf =>
      find(in, tf.name) match {
        case Some(inF) =>
          // required column receiving optional values ⇒ make optional
          val nullable = tf.nullable || inF.nullable
          tf.copy(dataType = evolveType(tf.dataType, inF.dataType), nullable = nullable)
        case None => tf
      }
    }
    // add new incoming fields (always optional on add, Iceberg rule)
    val known = updated.map(_.name.toLowerCase).toSet
    val added = in.fields.filter { f =>
      if (ci) !known.contains(f.name.toLowerCase) else !updated.exists(_.name == f.name)
    }.map(_.copy(nullable = true))
    StructType(updated ++ added)
  }
}
