package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Templated external-source fetch (S4/F6, reference
  * `services/sources/implementations/external_source/simple_api_service.py:19-61`
  * + `app/utils/string_utils.py:5-26`): a request template carries
  * `{PLACEHOLDER}` slots in its url/headers/body; params must cover exactly
  * the placeholders or the template is rejected before any request is made.
  *
  * The fetch itself is injected (`transport`) — a single driver-side request
  * in the reference too — and the response lands in a DataFrame via
  * `spark.read.json` over an in-memory Dataset, from where normal distributed
  * processing takes over.
  */
object ApiTemplate {

  final case class RequestTemplate(
      url: String,
      method: String = "GET",
      headers: Map[String, String] = Map.empty,
      body: Option[String] = None)

  private val placeholderRe = "\\{([A-Z0-9_]+)\\}".r

  /** All `{KEY}` placeholders appearing anywhere in the template (F6). */
  def extractPlaceholders(t: RequestTemplate): Set[String] = {
    val texts = Seq(t.url) ++ t.headers.keys ++ t.headers.values ++ t.body.toSeq
    texts.flatMap(s => placeholderRe.findAllMatchIn(s).map(_.group(1))).toSet
  }

  /** Params must cover every placeholder (reference raises on a partial
    * fill); extra params are rejected too — they indicate a config typo.
    */
  def render(t: RequestTemplate, params: Map[String, String]): RequestTemplate = {
    val needed = extractPlaceholders(t)
    val missing = needed -- params.keySet
    val extra = params.keySet -- needed
    require(missing.isEmpty, s"Missing template params: ${missing.mkString(", ")}")
    require(extra.isEmpty, s"Unknown template params: ${extra.mkString(", ")}")
    // single-pass regex substitution, NOT sequential replace: substituting
    // one param at a time re-scans earlier params' VALUES, so a value
    // containing "{OTHER}" would splice in another param (injection) with
    // map-iteration-order-dependent results
    def fill(s: String): String =
      placeholderRe.replaceAllIn(s, m =>
        java.util.regex.Matcher.quoteReplacement(params(m.group(1))))
    t.copy(
      url = fill(t.url),
      headers = t.headers.map { case (k, v) => fill(k) -> fill(v) },
      body = t.body.map(fill))
  }

  /** Fetch through the injected transport and parse the JSON (object or
    * array-of-objects) into a DataFrame.
    */
  def fetchJson(
      spark: SparkSession,
      template: RequestTemplate,
      params: Map[String, String],
      transport: RequestTemplate => String): DataFrame = {
    val response = transport(render(template, params))
    import spark.implicits._
    val lines: Dataset[String] = Seq(response).toDS()
    spark.read.json(lines)
  }
}
