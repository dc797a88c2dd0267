package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Typed conformance of a semi-structured JSON attribute blob: a
  * declarative key spec (name, JSON path, type) produces one
  * `struct<...>` column of coerced values alongside the raw blob/map —
  * the typed replacement for the reference's 120-line per-request
  * attribute coercion (webapp/mongodb_routes.py:151-274), which
  * re-derives types and value formats on every query.
  *
  * Coercions mirror the reference's tolerance for Python-repr artifacts
  * in the stored values:
  *   - Bool: JSON `true`/`false`, or the strings "True"/"true"/
  *     "False"/"false" (optionally u''-wrapped) → BooleanType; anything
  *     else (incl. absent / "None") → null.
  *   - Int: JSON number or a digit-string (the reference's
  *     RestaurantsPriceRange2 int-or-string dance) → LongType via a
  *     regex-guarded cast (ANSI-safe: no throw on junk, just null).
  *   - Str: u'value' / 'value' / "value" wrappers stripped → clean
  *     string (the reference probes three quote formats per lookup).
  *
  * Nested object attributes (the reference's BusinessParking.lot /
  * GoodForMeal.dinner / Ambience.casual probes) are just dotted paths.
  *
  * Scale shape: everything here is a codegen'd row-local expression —
  * conforming at scan time costs one projection, pushes no shuffle, and
  * downstream predicates on struct fields prune to the single `props`
  * column read. Conform once, filter typed forever — vs the reference
  * re-negotiating formats inside every endpoint.
  */
object Conform {

  sealed trait ConfType
  case object BoolKey extends ConfType
  case object IntKey extends ConfType
  case object StrKey extends ConfType

  /** One conformed field: struct field `name` from JSON `path`. */
  final case class KeySpec(name: String, path: String, tp: ConfType)
  object KeySpec {
    def apply(name: String, tp: ConfType): KeySpec = KeySpec(name, name, tp)
  }

  // Strip Python-repr wrappers: u'value' | 'value' | "value" → value.
  private val WrapperRe = "^u?'(.*)'$|^\"(.*)\"$"

  private def cleaned(c: Column): Column =
    regexp_replace(c, WrapperRe, "$1$2")

  // Top-level keys extract from ONE shared JSON parse: every key's
  // from_json(props) subtree is identical, so whole-stage codegen's
  // common-subexpression elimination evaluates it once per row — vs
  // get_json_object re-parsing the blob per key. Dotted paths (nested
  // probes) keep the path extractor.
  private def raw(props: Column, path: String): Column =
    if (path.contains("."))
      get_json_object(props, "$." + path)
    else
      element_at(from_json(props, org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.StringType)), path)

  private def coerce(props: Column, k: KeySpec): Column = {
    val raw = this.raw(props, k.path)
    k.tp match {
      case BoolKey =>
        val v = lower(cleaned(raw))
        when(v === "true", lit(true))
          .when(v === "false", lit(false))
          .otherwise(lit(null).cast("boolean"))
      case IntKey =>
        val v = cleaned(raw)
        when(v.rlike("^-?[0-9]+$"), v.cast("long"))
          .otherwise(lit(null).cast("long"))
      case StrKey => cleaned(raw)
    }
  }

  /** The conformed struct column for `keys` over JSON blob `props`. */
  def conformed(props: Column, keys: Seq[KeySpec]): Column =
    struct(keys.map(k => coerce(props, k).as(k.name)): _*)

  // ---- DuckDB oracle twin (same coercion, DuckDB JSON/regex syntax) ----

  private def duckCleaned(e: String): String =
    s"""regexp_replace($e, '^u?''(.*)''$$|^"(.*)"$$', '\\1\\2')"""

  /** DuckDB expression computing the same coerced value for one key. */
  def duckCoerce(propsCol: String, k: KeySpec): String = {
    val raw = s"json_extract_string($propsCol, '$$.${k.path}')"
    k.tp match {
      case BoolKey =>
        s"""(CASE lower(${duckCleaned(raw)})
           |  WHEN 'true' THEN TRUE WHEN 'false' THEN FALSE END)""".stripMargin
      case IntKey =>
        s"""(CASE WHEN regexp_matches(${duckCleaned(raw)}, '^-?[0-9]+$$')
           |  THEN CAST(${duckCleaned(raw)} AS BIGINT) END)""".stripMargin
      case StrKey => duckCleaned(raw)
    }
  }
}
