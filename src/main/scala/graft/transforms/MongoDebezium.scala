package graft.transforms

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** C8 — Debezium-MongoDB envelope flattener
  * (`transforms/MongoDebeziumTransform.java:84-131`, patch merge
  * `:148-190`).
  *
  * Debezium's Mongo connector emits the document as an extended-JSON
  * *string* (`before`/`after`), and partial updates as an
  * `updateDescription` carrying the changed fields plus removed field
  * names. This operator reconstructs the full after-image field-wise in
  * the typed domain:
  *
  *  - one schema is inferred across before/after/updatedFields samples
  *    (C7-style driver pass), so a patched `age: 41` stays numeric
  *  - op `u` with a partial update: field = removed ? null :
  *    coalesce(updatedFields.f, before.f)   (`:148-190`)
  *  - op `d`: payload = before image; otherwise payload = after
  *  - `_cdc` struct {op: u→U | d→D | else I, ts, source: db.collection}
  *
  * Fidelity note: the reference dispatches on 13 BSON types through the
  * Mongo Java driver (`MongoDataConverter.java:43-260`); this container
  * has no BSON library, so values ride their JSON representations and
  * types come from JSON inference — the dataflow shape (patch merge,
  * image selection, typed promotion) is the same.
  */
object MongoDebezium {

  def mongoDebezium()(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    val hasUpdate = df.columns.contains("updateDescription")

    // infer one typed schema across every document image we may read
    val samples =
      if (hasUpdate)
        df.select(explode(array(col("before"), col("after"),
          col("updateDescription.updatedFields"))).as("j"))
      else df.select(explode(array(col("before"), col("after"))).as("j"))
    val schema = df.sparkSession.read
      .json(samples.filter(col("j").isNotNull).as[String]).schema
    val clean = StructType(schema.fields.filterNot(_.name.startsWith("_corrupt")))

    val before = from_json(col("before"), clean)
    val after = from_json(col("after"), clean)
    val op = col("op")
    val removed =
      if (hasUpdate) coalesce(col("updateDescription.removedFields"),
        array().cast(ArrayType(StringType)))
      else array().cast(ArrayType(StringType))
    val upd =
      if (hasUpdate) from_json(col("updateDescription.updatedFields"), clean)
      else lit(null).cast(clean)

    val partialUpdate =
      if (hasUpdate) op === "u" && col("updateDescription").isNotNull && col("after").isNull
      else lit(false)

    val payloadCols: Seq[Column] = clean.fields.toSeq.map { f =>
      val patched = when(array_contains(removed, f.name), lit(null).cast(f.dataType))
        .otherwise(coalesce(upd.getField(f.name), before.getField(f.name)))
      when(partialUpdate, patched)
        .when(op === "d", before.getField(f.name))
        .otherwise(after.getField(f.name))
        .as(f.name)
    }

    val opMapped = when(op === "u", "U").when(op === "d", "D").otherwise("I")
    val cdc = struct(
      opMapped.as("op"),
      timestamp_millis(col("ts_ms").cast(LongType)).as("ts"),
      concat_ws(".", col("source.db"), col("source.collection")).as("source"))

    df.select(payloadCols :+ cdc.as("_cdc"): _*)
  }
}
