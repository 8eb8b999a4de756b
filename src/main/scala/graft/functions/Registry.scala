package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Whitelisted scalar-function catalog — the engine's analog of the
  * reference's UDF registry (`app/utils/__init__.py:7-12`, gated at
  * `elasticsearch_to_postgresql.py:100-111`: only names exported in
  * `app.utils.__all__` may be called from pipeline config).
  *
  * Each entry maps a name to a builder producing one struct-typed Column so a
  * single call can fan out into several output columns (the reference's
  * AdditionalFields splat, `tsv_converter.py:199-209`): callers `select`
  * `result.getField(...)` per `outputMapping`.
  */
object Registry {

  /** A registered function: positional arg names (pulled from `inputMapping`/
    * `staticArgs` in config) and a Column builder over resolved arg columns.
    */
  final case class RegisteredFn(argNames: Seq[String], build: Map[String, Column] => Column)

  private val isoToPartsUdf = udf { (iso: String, expectedTz: Int, handle: String, allowEmpty: Boolean) =>
    TimeFunctions.isoToParts(iso, expectedTz, handle, allowEmpty)
  }

  /** Literal value of a config-arg Column, when it is one. Config args are
    * `lit(...)` in every real pipeline; a non-literal (a computed column fed
    * as a function knob) falls back to the UDF form.
    */
  private def litValue(c: Column): Option[Any] =
    org.apache.spark.sql.graftbridge.ColumnBridge.literalValue(c)

  // config staticArgs are strings (FnField.staticArgs: Map[String, String]);
  // coerce them the way the UDF path's implicit casts did
  private def litBool(c: Column): Option[Boolean] = litValue(c).flatMap {
    case b: Boolean => Some(b)
    case s: String => s.toLowerCase match {
      case "true" => Some(true); case "false" => Some(false); case _ => None
    }
    case _ => None
  }
  private def litInt(c: Column): Option[Int] = litValue(c).flatMap {
    case i: Int => Some(i)
    case s: String => s.toIntOption
    case _ => None
  }

  /** The whitelist. Unknown names are a config error, mirroring the
    * reference's `__all__` gate.
    */
  val all: Map[String, RegisteredFn] = Map(
    // F2 — ISO string -> struct(datetime, microseconds, month). Config knobs
    // are literals at config-parse time, so the native codegen expression
    // applies; the UDF form survives only for dynamic (non-literal) knobs.
    "iso_to_dict" -> RegisteredFn(
      Seq("iso_time", "expected_timezone", "handle_timezone", "allow_empty"),
      args => {
        val tz = args.getOrElse("expected_timezone", lit(0))
        val handle = args.getOrElse("handle_timezone", lit("error"))
        val allowEmpty = args.getOrElse("allow_empty", lit(false))
        (litInt(tz), litValue(handle), litBool(allowEmpty)) match {
          case (Some(t), Some(h), Some(a)) =>
            TimeExpressions.isoToParts(args("iso_time"), t, String.valueOf(h), a)
          case _ => isoToPartsUdf(args("iso_time"), tz, handle, allowEmpty)
        }
      }),
    // F1 — fractional-second normalization, struct for uniform splat shape
    "normalize_iso_time" -> RegisteredFn(
      Seq("iso_time"),
      args => struct(TimeExpressions.normalizeIso(args("iso_time")).as("normalized"))),
    // F8 — run-scoped current time string (dynamic checkpoint field)
    "current_time" -> RegisteredFn(
      Seq(),
      _ => struct(date_format(current_timestamp(), "yyyy-MM-dd HH:mm:ss").as("current_time")))
  )

  def apply(name: String): RegisteredFn =
    all.getOrElse(name, throw new graft.GraftConfigError(
      s"Function '$name' is not in the registry whitelist: ${all.keys.mkString(", ")}"))

  // Native (non-UDF) Column equivalents for hot paths ----------------------

  /** F2 as pure built-ins over an already-parsed timestamp column: stays in
    * whole-stage codegen, used by the flagship query instead of the UDF.
    */
  def timestampParts(ts: Column): (Column, Column, Column) = (
    date_format(ts, "yyyy-MM-dd HH:mm:ss"),
    // pmod, not %: truncated remainder goes negative for pre-epoch
    // timestamps, while the UDF path (getNano/1000) is always 0..999999
    pmod(unix_micros(ts), lit(1000000L)).cast("int"),
    date_format(date_trunc("month", ts), "yyyy-MM-dd"))

  /** F3 — TSV value sanitization (reference `tsv_converter.py:83-94`):
    * tabs/newlines become spaces.
    */
  def sanitizeTsv(c: Column): Column = regexp_replace(c, "[\\t\\n]", " ")

  /** F4 — string-NaN normalization at CSV-ingest parity
    * (reference `postgresql_service.py:290-291`).
    */
  def nanToNull(c: Column): Column = when(c.isin("nan", "NaN"), lit(null)).otherwise(c)
}
