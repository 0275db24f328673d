package graft.typing

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** External JSON schema document → typed ingestion.
  *
  * The reference types raw string views with `TypingTransform` against a
  * versioned JSON schema doc (`example/notebook/scd2-job.ipynb:88-96`,
  * `"schemaURI": ".../contact_meta_0.json"`). Arc's semantics: every field is
  * parsed/cast from string; a value that fails typing yields a typed null plus
  * an error record. We reproduce that with pure Catalyst expressions —
  * `try_cast`-style lenient casts plus an `_errors array<struct<field,message>>`
  * side column — so the whole transform stays inside whole-stage codegen
  * (no UDFs, no driver-side row loops; scales linearly with input splits).
  *
  * Doc format (one entry per column):
  * `[{"name": "id", "type": "long", "nullable": false,
  *    "trim": true, "nullableValues": ["", "null"],
  *    "formatters": ["uuuu-MM-dd HH:mm:ss"]}]`
  */
final case class FieldDef(
    name: String,
    typ: String,
    nullable: Boolean,
    trim: Boolean,
    nullableValues: Seq[String],
    formatters: Seq[String]) {

  def dataType: DataType = SchemaDoc.parseType(typ)
}

final case class SchemaDoc(fields: Seq[FieldDef]) {

  def structType: StructType =
    StructType(fields.map(f => StructField(f.name, f.dataType, f.nullable)))

  /** Apply typing to a raw (all-string) DataFrame whose columns are matched by
    * name (the reference extracts headerless CSV with positional names then
    * types by the doc's order; we support both — `positional=true` maps the
    * i-th input column to the i-th field). Output: typed columns in doc order
    * plus `_errors: array<struct<field:string, message:string>>`.
    */
  def apply(raw: DataFrame, positional: Boolean = false): DataFrame = {
    val inCols: Seq[Column] =
      if (positional) raw.columns.toSeq.take(fields.size).map(col)
      else fields.map(f => col(f.name))
    require(inCols.size == fields.size, s"schema doc has ${fields.size} fields, input has ${inCols.size} columns")

    val typedAndErr = fields.zip(inCols).map { case (f, in) =>
      val trimmed = if (f.trim) trim(in.cast(StringType)) else in.cast(StringType)
      val asNull = if (f.nullableValues.nonEmpty) {
        when(trimmed.isin(f.nullableValues: _*), lit(null).cast(StringType)).otherwise(trimmed)
      } else trimmed
      // timestamps/dates try every declared formatter in order (Arc
      // semantics); all parse paths are try_ variants so a bad value yields
      // null + an error record even under ANSI mode
      val typed: Column = f.dataType match {
        case TimestampType =>
          if (f.formatters.isEmpty) try_to_timestamp(asNull)
          else coalesce(f.formatters.map(fmt => try_to_timestamp(asNull, lit(fmt))): _*)
        case DateType =>
          val parsed =
            if (f.formatters.isEmpty) try_to_timestamp(asNull)
            else coalesce(f.formatters.map(fmt => try_to_timestamp(asNull, lit(fmt))): _*)
          parsed.cast(DateType)
        case BooleanType =>
          // reference coerces int flags to booleans (`1 AS iscurrent` read back
          // as `iscurrent=true`, scd2-job.ipynb:144,313) — accept 1/0/t/f/true/false
          when(lower(asNull).isin("1", "t", "true", "y", "yes"), lit(true))
            .when(lower(asNull).isin("0", "f", "false", "n", "no"), lit(false))
            .otherwise(lit(null).cast(BooleanType))
        case dt => asNull.try_cast(dt)
      }
      // Typing failure = raw was non-null but typed is null (Arc error semantics)
      val err = when(asNull.isNotNull && typed.isNull,
        struct(lit(f.name).as("field"),
          concat(lit(s"cannot convert '"), asNull, lit(s"' to ${f.typ}")).as("message")))
        .when(asNull.isNull && !f.nullable,
          struct(lit(f.name).as("field"), lit(s"null value for non-nullable field").as("message")))
      (typed.as(f.name), err)
    }
    val errors = filter(array(typedAndErr.map(_._2): _*), e => e.isNotNull).as("_errors")
    raw.select(typedAndErr.map(_._1) :+ errors: _*)
  }
}

object SchemaDoc {
  private val mapper = new ObjectMapper()

  def fromJson(json: String): SchemaDoc = {
    val root = mapper.readTree(json)
    require(root.isArray, "schema doc must be a JSON array of field defs")
    SchemaDoc(root.elements().asScala.map(parseField).toSeq)
  }

  def fromFile(path: String): SchemaDoc =
    fromJson(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))

  private def parseField(n: JsonNode): FieldDef = FieldDef(
    name = n.get("name").asText(),
    typ = n.get("type").asText(),
    nullable = if (n.has("nullable")) n.get("nullable").asBoolean() else true,
    trim = if (n.has("trim")) n.get("trim").asBoolean() else true,
    nullableValues =
      if (n.has("nullableValues")) n.get("nullableValues").elements().asScala.map(_.asText()).toSeq
      else Seq(""),
    formatters =
      if (n.has("formatters")) n.get("formatters").elements().asScala.map(_.asText()).toSeq
      else Seq.empty)

  private val DecimalRe = raw"decimal\((\d+),\s*(\d+)\)".r

  def parseType(t: String): DataType = t.toLowerCase match {
    case "string" | "varchar"      => StringType
    case "integer" | "int"         => IntegerType
    case "long" | "bigint"         => LongType
    case "double"                  => DoubleType
    case "float"                   => FloatType
    case "boolean" | "bool"        => BooleanType
    case "timestamp"               => TimestampType
    case "date"                    => DateType
    case "binary"                  => BinaryType
    case DecimalRe(p, s)           => DecimalType(p.toInt, s.toInt)
    case other                     => throw new IllegalArgumentException(s"unsupported schema-doc type '$other'")
  }
}
