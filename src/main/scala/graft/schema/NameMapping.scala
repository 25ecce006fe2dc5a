package graft.schema

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** E4 — `schema.name-mapping.default` table property, the Iceberg name
  * mapping the reference reads in `data/RecordConverter.java:100-103` and
  * applies during field lookup (`:245-271`): incoming records may use any
  * alias listed for a column and still land in it.
  *
  * Accepted JSON forms:
  *  - Iceberg `NameMappingParser` format: a list of
  *    `{"field-id": n, "names": [...], "fields": [...]}` entries. Field ids
  *    are resolved against the table schema by fresh-assignment order —
  *    each struct's direct fields are numbered first (root = 1..n), then
  *    children are numbered recursively in field order, which is the id
  *    layout Iceberg gives a newly created schema.
  *  - a plain object `{"column": ["alias", ...], ...}` keyed directly by
  *    top-level column name.
  *
  * The result maps target column name → aliases, consumed by
  * [[graft.operators.Coercion.resolveField]]. Mapping entries for nested
  * fields are resolved with dotted keys (`"s.a" -> aliases`) for callers
  * that need them; top-level projection uses the top-level entries.
  */
object NameMapping {

  private val mapper = new ObjectMapper()

  def parse(json: String, schema: StructType): Map[String, Seq[String]] = {
    val root = mapper.readTree(json)
    if (root.isObject) {
      root.properties().asScala.map { e =>
        e.getKey -> e.getValue.elements().asScala.map(_.asText).toSeq
      }.toMap
    } else if (root.isArray) {
      val idToPath = assignFreshIds(schema)
      val out = Map.newBuilder[String, Seq[String]]
      def walk(entries: JsonNode): Unit =
        entries.elements().asScala.foreach { e =>
          if (e.has("field-id") && e.has("names")) {
            val id = e.get("field-id").asInt
            val names = e.get("names").elements().asScala.map(_.asText).toSeq
            idToPath.get(id).filter(_ => names.nonEmpty).foreach(p => out += p -> names)
          }
          if (e.has("fields")) walk(e.get("fields"))
        }
      walk(root)
      out.result()
    } else Map.empty
  }

  /** Iceberg fresh-id assignment (TypeUtil.assignFreshIds order): number a
    * struct's direct fields first, then recurse into each field's type in
    * order — where LIST element and MAP key/value also consume ids
    * (Iceberg gives every nested type an id; skipping them would shift
    * every id after the first array/map and bind aliases to the wrong
    * columns). Returns id → dotted path; element/key/value ids use
    * Iceberg's names ("tags.element") — not projectable, but they must
    * hold their id slots.
    */
  private[schema] def assignFreshIds(schema: StructType): Map[Int, String] = {
    val out = Map.newBuilder[Int, String]
    var next = 1
    def visitType(dt: DataType, prefix: String): Unit = dt match {
      case st: StructType => struct(st, prefix)
      case ArrayType(et, _) =>
        val id = next; next += 1
        out += id -> (prefix + "element")
        visitType(et, prefix + "element.")
      case MapType(kt, vt, _) =>
        val kid = next; next += 1
        out += kid -> (prefix + "key")
        val vid = next; next += 1
        out += vid -> (prefix + "value")
        visitType(kt, prefix + "key.")
        visitType(vt, prefix + "value.")
      case _ => ()
    }
    def struct(s: StructType, prefix: String): Unit = {
      s.fields.foreach { f =>
        val id = next; next += 1
        out += id -> (prefix + f.name)
      }
      s.fields.foreach(f => visitType(f.dataType, prefix + f.name + "."))
    }
    struct(schema, "")
    out.result()
  }
}
