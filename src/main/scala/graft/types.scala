package graft

import org.apache.spark.sql.Column

/** Config ADTs for the declarative pipeline surface.
  *
  * Mirrors the reference's config-driven schema system (SURVEY.md §1.3):
  * per-run `fields_mapping` / `rename_maps` / `type_maps` /
  * `additional_fields` dicts (reference: `services/transformers/tsv_converter.py:46-52`,
  * `models/mappings/rename_maps.py`, `models/mappings/type_maps.py`,
  * `models/helpers/additional_fields.py:5-27`), re-expressed as plain Scala
  * data interpreted into one Catalyst logical plan.
  */
object types {

  /** Output column spec: pull `path` (possibly nested, e.g. "_source.data.field1")
    * and surface it as `name`. Missing/null value handling is configured at the
    * operator level (reference `tsv_converter.py:164-186`).
    */
  final case class FieldSpec(name: String, path: String)

  /** Declarative scan-time query (reference `models/queries/elastic_query_model.py:18-61`):
    * a half-open time window `[start, end)` — applied only when BOTH bounds are
    * present (`elastic_query_model.py:38-40`), conjunctive equality filters,
    * optional column projection, and a scan-order sort.
    */
  final case class QuerySpec(
      rangeField: Option[String] = None,
      start: Option[String] = None,
      end: Option[String] = None,
      filters: Seq[(String, String)] = Nil,
      sourceFields: Option[Seq[String]] = None,
      sortBy: Seq[(String, Boolean)] = Nil // (field, ascending)
  )

  /** Enrichment spec (reference `models/helpers/additional_fields.py` + the
    * function-valued variant applied at `tsv_converter.py:105-154`).
    */
  sealed trait AdditionalField { def outputFields: Seq[String] }

  /** Constant columns appended to every row (T2). */
  final case class ConstField(value: String, outputFields: Seq[String]) extends AdditionalField

  /** Function-valued field (U1): call a function from the whitelisted registry
    * ([[graft.functions.Registry]]) with args pulled from row fields
    * (`inputMapping`: argName -> column path) plus constants (`staticArgs`),
    * then splat the struct result into output columns renamed per
    * `outputMapping` (resultField -> outputColumn).
    */
  final case class FnField(
      fn: String,
      inputMapping: Map[String, String],
      staticArgs: Map[String, String],
      outputMapping: Map[String, String]
  ) extends AdditionalField {
    def outputFields: Seq[String] = outputMapping.values.toSeq
  }

  /** Dedup spec (W1, reference `pandas_select_and_enrich.py:52-57`): keep the
    * first row per `dedupBy` key in `orderBy` order. `tiebreak` supplies the
    * stable-sort determinism pandas gets for free (SURVEY.md §7.4.1).
    */
  final case class DedupSpec(dedupBy: Seq[String], orderBy: Seq[String], tiebreak: Option[Column] = None)

  /** Column type coercion spec (S3 semantics, reference `s3_service.py:171-182`):
    * lenient casts — `coerce` = bad value -> null (try_cast/to_timestamp),
    * `ignore` = bad value -> left as original string.
    */
  sealed trait CastMode
  case object CastCoerce extends CastMode
  case object CastIgnore extends CastMode
  final case class TypeSpec(column: String, target: String, mode: CastMode = CastCoerce)

  /** Upsert conflict semantics (K2, reference `postgresql_service.py:214-229`). */
  sealed trait ConflictAction
  case object ConflictUpdate extends ConflictAction // ON CONFLICT DO UPDATE
  case object ConflictNothing extends ConflictAction // ON CONFLICT DO NOTHING
}
