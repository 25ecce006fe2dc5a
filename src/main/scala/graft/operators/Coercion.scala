package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** R5 + C1-C6 — projection of an arbitrary input DataFrame onto a target
  * table schema with permissive, reference-parity type coercion.
  *
  * The reference converts record-by-record in Java
  * (`data/RecordConverter.java:105-144` dispatch; leaf coercions
  * `:302-506`). Here the whole conversion is declared as a Catalyst select
  * list — every cast/parse is codegen'd and runs columnar, and Catalyst
  * prunes unused source columns all the way into the scan.
  *
  * Coercion rules mirrored:
  *  - numbers from Number or parsed String (`:302-336`) → permissive `cast`
  *    (requires `spark.sql.ansi.enabled=false`, set by [[graft.GraftSession]])
  *  - decimal rescale HALF_UP (`:338-357`) → Spark decimal cast (HALF_UP)
  *  - anything → string, complex types JSON-encoded (`:368-385`)
  *  - binary from Base64 string (`:387-405`)
  *  - date/time/timestamp from epoch numbers (millis, `:407-495`) and
  *    lenient ISO strings incl. `"yyyy-MM-dd HH:mm:ss"` repair (`:497-506`)
  *  - nested struct/list/map recursion (`:273-300`)
  *  - field lookup: exact, case-insensitive, or name-mapping alias
  *    (`:245-271`); unmatched target fields → null, extra source fields
  *    dropped (`:159-243`)
  */
object Coercion {

  /** Project `df` onto `target`. `extraCols` are carried through untouched
    * (used by the CDC path for op/order bookkeeping columns).
    *
    * `strict`: the reference surfaces a conversion error when a record
    * value cannot coerce (`RecordConverter` throws from the leaf
    * converters); Spark's ANSI-off casts null instead. With
    * `strict = true` any TOP-LEVEL column whose non-null source value
    * coerces to null fails the batch with a `raise_error` naming the
    * column — matching the operator expectation that bad data stops the
    * pipeline rather than silently degrading. (Nested-field nulling
    * stays permissive: the check is per projected column.)
    */
  def project(
      df: DataFrame,
      target: StructType,
      nameMapping: Map[String, Seq[String]] = Map.empty,
      caseInsensitive: Boolean = true,
      extraCols: Seq[String] = Nil,
      strict: Boolean = false
  ): DataFrame = {
    val available = df.schema
    val cols = target.fields.toSeq.map { f =>
      resolveField(available, f.name, nameMapping, caseInsensitive) match {
        case Some(src) =>
          val in = qcol(src.name)
          val coerced = coerce(in, src.dataType, f.dataType, caseInsensitive,
            scopedMapping(nameMapping, f.name))
          val violation = topLevelViolation(in, src.dataType, f.dataType, caseInsensitive,
            scopedMapping(nameMapping, f.name))
          val checked =
            if (!strict) coerced
            else
              when(violation,
                raise_error(concat(
                  lit(s"strict coercion: column '${src.name}' value '"),
                  in.cast(StringType),
                  lit(s"' does not convert to ${f.dataType.sql}"))).cast(f.dataType))
                .otherwise(coerced)
          checked.as(f.name)
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    } ++ extraCols.map(col)
    df.select(cols: _*)
  }

  /** Backtick-quoted column reference: a top-level source column named
    * `user.id` (flattened-JSON shape) must not parse as a nested-field
    * path. Literal backticks in the name escape by doubling.
    */
  private def qcol(name: String): Column =
    col("`" + name.replace("`", "``") + "`")

  /** The strict/DLQ violation condition for one TOP-LEVEL column: a
    * non-null source value whose coercion nulls — plus, for map columns
    * whose key type changes, any entry whose KEY nulls (the permissive
    * path DROPS such entries, see [[coerce]]'s map arm; strict and the
    * dead-letter split must surface them instead of losing them quietly).
    */
  private def topLevelViolation(
      in: Column,
      from: DataType,
      to: DataType,
      caseInsensitive: Boolean,
      // the SAME scoped mapping the projection's coerce uses: without it
      // the violation check resolved nested aliases differently than the
      // projected tree — a divergent duplicate subtree Catalyst cannot
      // CSE-merge, and a latent wrong-field trap for nested checks
      nameMapping: Map[String, Seq[String]] = Map.empty): Column = {
    val base = in.isNotNull && coerce(in, from, to, caseInsensitive, nameMapping).isNull
    (from, to) match {
      case (f: MapType, t: MapType) if f.keyType != t.keyType =>
        base || (in.isNotNull &&
          exists(map_keys(in), k => coerce(k, f.keyType, t.keyType, caseInsensitive).isNull))
      case _ => base
    }
  }

  /** Per-row violation reason for the dead-letter path: the FIRST
    * projected column whose non-null source value would coerce to null,
    * as a message column (NULL = the row is clean). Same per-column
    * condition as [[project]]'s strict arm, but as data instead of a
    * batch-failing `raise_error` — `errors.tolerance=all` semantics:
    * split on this, route the dead slice, keep the batch alive.
    */
  def violationReason(
      df: DataFrame,
      target: StructType,
      nameMapping: Map[String, Seq[String]] = Map.empty,
      caseInsensitive: Boolean = true
  ): Column = {
    val available = df.schema
    val checks: Seq[Column] = target.fields.toSeq.flatMap { f =>
      resolveField(available, f.name, nameMapping, caseInsensitive).map { src =>
        val in = qcol(src.name)
        when(topLevelViolation(in, src.dataType, f.dataType, caseInsensitive,
          scopedMapping(nameMapping, f.name)),
          concat(lit(s"column '${src.name}' value '"), in.cast(StringType),
            lit(s"' does not convert to ${f.dataType.sql}")))
      }
    }
    coalesce(checks :+ lit(null).cast(StringType): _*)
  }

  /** Field lookup: exact name, case-insensitive name, then name-mapping
    * aliases (`RecordConverter.java:245-271`, E3/E4).
    */
  def resolveField(
      in: StructType,
      name: String,
      nameMapping: Map[String, Seq[String]],
      caseInsensitive: Boolean
  ): Option[StructField] =
    in.fields
      .find(_.name == name)
      .orElse(if (caseInsensitive) in.fields.find(_.name.equalsIgnoreCase(name)) else None)
      .orElse {
        nameMapping.get(name).flatMap { aliases =>
          in.fields.find(f => aliases.contains(f.name))
        }
      }

  /** Sub-mapping visible one level below `field`: dotted name-mapping keys
    * (`"s.a" -> aliases`, as [[graft.schema.NameMapping.parse]] emits for
    * nested entries) with the field's prefix stripped, so each recursion
    * level resolves against direct child names — the reference applies
    * the mapping at every lookup depth (`RecordConverter.java:245-271`).
    */
  private def scopedMapping(
      m: Map[String, Seq[String]], field: String): Map[String, Seq[String]] =
    if (m.isEmpty) Map.empty
    else m.collect { case (k, v) if k.startsWith(field + ".") =>
      k.stripPrefix(field + ".") -> v
    }

  /** Build the coercion expression from `from` to `to`.
    * `caseInsensitive` governs NESTED struct-field resolution too, so
    * `schema-case-insensitive = false` means the same thing at every
    * depth (a nested `ID`→`id` match is refused exactly like a
    * top-level one); `nameMapping` carries the CURRENT level's alias
    * entries (scope with [[scopedMapping]] when recursing).
    */
  def coerce(
      in: Column,
      from: DataType,
      to: DataType,
      caseInsensitive: Boolean = true,
      nameMapping: Map[String, Seq[String]] = Map.empty): Column =
    (from, to) match {
      case (f, t) if f == t => in

      // ---- to string (C4): complex types JSON-encoded ----
      case (_: StructType | _: ArrayType | _: MapType, StringType) => to_json(in)
      case (_, StringType)                                         => in.cast(StringType)

      // ---- binary (C5): Base64 from strings ----
      case (StringType, BinaryType) => unbase64(in)
      case (_, BinaryType)          => in.cast(BinaryType)

      // ---- temporal (C6): epoch numbers are MILLIS in the reference ----
      // ANY Number is epoch millis there (RecordConverter.java:407-495
      // calls .longValue()); a bare Spark cast would read numerics as
      // epoch SECONDS (fractional sources 1000x off), so every numeric
      // source routes through the millis arm
      case (_: NumericType, TimestampType) => timestamp_millis(in.cast(LongType))
      case (_: NumericType, TimestampNTZType) =>
        timestamp_millis(in.cast(LongType)).cast(TimestampNTZType)
      case (StringType, TimestampType)    => lenientTimestamp(in).cast(TimestampType)
      case (StringType, TimestampNTZType) => lenientTimestamp(in).cast(TimestampNTZType)
      case (_: NumericType, DateType) => date_from_unix_date(in.cast(IntegerType))
      case (StringType, DateType)     => to_date(in)

      // ---- nested recursion (C1) ----
      case (f: StructType, t: StructType) =>
        val fields = t.fields.toSeq.map { tf =>
          resolveField(f, tf.name, nameMapping, caseInsensitive) match {
            case Some(sf) =>
              coerce(in.getField(sf.name), sf.dataType, tf.dataType, caseInsensitive,
                scopedMapping(nameMapping, tf.name)).as(tf.name)
            case None => lit(null).cast(tf.dataType).as(tf.name)
          }
        }
        when(in.isNull, lit(null).cast(t)).otherwise(struct(fields: _*))
      case (f: ArrayType, t: ArrayType) =>
        transform(in, x => coerce(x, f.elementType, t.elementType, caseInsensitive,
          scopedMapping(nameMapping, "element")))
      case (f: MapType, t: MapType) =>
        // a coerced-to-null KEY cannot exist in a map (Spark throws
        // "Cannot use null as map key" at runtime, which no DLQ filter
        // could catch — the crash happens evaluating the filter itself);
        // the permissive analogue of cast-to-null is DROPPING the entry.
        // Strict/DLQ paths flag these rows via [[mapKeyViolation]].
        val keyed =
          if (f.keyType == t.keyType)
            // same key type ⇒ key coercion is an identity cast: no nulls,
            // no collisions — keep the cheap transform_keys path
            transform_keys(in, (k, _) => coerce(k, f.keyType, t.keyType, caseInsensitive,
              scopedMapping(nameMapping, "key")))
          else {
            // a key-type CHANGE can also COLLIDE distinct source keys
            // ("1" and "01" both cast to int 1), and transform_keys then
            // throws Spark's uncatchable duplicate-map-key error — the
            // same poison-record class as the null key. Rebuild through
            // entries instead and dedupe collided keys LAST-WINS (the
            // reference's Java converter fills a HashMap, where a later
            // put for the same key overwrites the earlier one).
            val dropBadKeys = map_filter(in,
              (k, _) => coerce(k, f.keyType, t.keyType, caseInsensitive).isNotNull)
            val coercedEntries = transform(map_entries(dropBadKeys), e => struct(
              coerce(e.getField("key"), f.keyType, t.keyType, caseInsensitive,
                scopedMapping(nameMapping, "key")).as("key"),
              e.getField("value").as("value")))
            // reverse + first-wins = last-wins; slice(x, 1, 0) is an
            // empty array of exactly the accumulator's type. O(k²) per
            // map over typically-small maps, and only on the
            // key-type-change path.
            val deduped = aggregate(
              reverse(coercedEntries),
              slice(coercedEntries, lit(1), lit(0)),
              (acc, e) => when(
                exists(acc, a => a.getField("key") <=> e.getField("key")), acc)
                .otherwise(concat(acc, array(e))))
            map_from_entries(deduped)
          }
        transform_values(keyed, (_, v) => coerce(v, f.valueType, t.valueType, caseInsensitive,
          scopedMapping(nameMapping, "value")))

      // JSON string → struct/array/map (schemaless record path, C7)
      case (StringType, t: StructType) => from_json(in, t)
      case (StringType, t: ArrayType)  => from_json(in, t)
      case (StringType, t: MapType)    => from_json(in, t)

      // ---- numerics / decimal / everything else: permissive cast ----
      case (_, t) => in.cast(t)
    }

  /** Lenient timestamp parse mirroring `ensureTimestampFormat`
    * (`RecordConverter.java:497-506`): accepts ISO-8601 with `T` or space
    * separator and `+HH:mm` / `+HHmm` offsets. Spark's non-ANSI
    * string→timestamp cast already accepts all of these; the explicit
    * repair keeps exact parity for `+HHmm` (no colon) offsets.
    */
  def lenientTimestamp(s: Column): Column = {
    val repaired = regexp_replace(
      s,
      "([+-])(\\d{2})(\\d{2})$",
      "$1$2:$3"
    )
    coalesce(repaired.cast(TimestampType), s.cast(TimestampType))
  }
}
