package graft.tsdb

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** OpenTSDB `POST /api/query` wire-JSON → [[TsdbQuery]] — EP2 parity:
  * the reference's primary read API takes this exact payload (SURVEY
  * §3.1 EP2 [PK-H]). Jackson databind is already on the Spark
  * classpath (Spark's own dependency), so this adds no library.
  *
  * Strict where a server must be strict — unknown filter type, missing
  * `metric`/`aggregator`/`start`, empty `queries`, malformed JSON all
  * raise IllegalArgumentException (the HTTP 400 analog) at the API
  * edge instead of deep inside planning. Lenient where OpenTSDB is
  * lenient — `start`/`end` accept epoch seconds, epoch millis, or
  * relative `<n><unit>-ago` strings ([[TimeParse.toAbsMs]]); `end`
  * defaults to now; the legacy 2.x `tags` map is rewritten to groupBy
  * filters (`*` → wildcard, anything else → literal_or), the
  * documented compatibility behavior. `nowMs` is caller-supplied (D5:
  * pinned NOW, never wall-clock, so parsed requests are replayable).
  */
object RequestJson {
  private val mapper = new ObjectMapper

  def parse(json: String, nowMs: Long): TsdbQuery = {
    val root =
      try mapper.readTree(json)
      catch {
        case e: Exception =>
          throw new IllegalArgumentException(
            s"malformed JSON request: ${e.getMessage}")
      }
    require(root != null && root.isObject, "request must be a JSON object")
    val start = time(root.get("start"), nowMs).getOrElse(
      throw new IllegalArgumentException("missing required field: start"))
    val end = time(root.get("end"), nowMs).getOrElse(nowMs)
    require(end > start, s"end ($end) must be after start ($start)")
    val qn = root.get("queries")
    require(qn != null && qn.isArray && qn.size > 0,
      "queries must be a non-empty array")
    TsdbQuery(start, end, qn.elements().asScala.map(subQuery).toSeq)
  }

  /** start/end: JSON number or string; epoch s vs ms and relative specs
    * all resolve through [[TimeParse.toAbsMs]]. */
  private def time(n: JsonNode, nowMs: Long): Option[Long] =
    Option(n).filter(v => v.isNumber || v.isTextual)
      .map(v => TimeParse.toAbsMs(v.asText, nowMs))

  private def str(o: JsonNode, field: String): String = {
    val n = o.get(field)
    require(n != null && n.isTextual && n.asText.nonEmpty,
      s"missing required field: $field")
    n.asText
  }

  private def subQuery(o: JsonNode): SubQuery = {
    require(o.isObject, "each query must be a JSON object")
    val metric = str(o, "metric")
    val agg = str(o, "aggregator")
    val ds = Option(o.get("downsample")).filter(_.isTextual)
      .map(n => TimeParse.parseDownsample(n.asText))
    val rate = Option(o.get("rate")).exists(_.asBoolean(false))
    val ro = Option(o.get("rateOptions")).filter(_.isObject).map { r =>
      RateOptions(
        counter = Option(r.get("counter")).exists(_.asBoolean(false)),
        counterMax = Option(r.get("counterMax")).filter(_.isNumber).map(_.asLong),
        resetValue = Option(r.get("resetValue")).filter(_.isNumber).map(_.asLong))
    }.getOrElse(RateOptions())
    val filters = Option(o.get("filters")).filter(_.isArray).toSeq
      .flatMap(_.elements().asScala.map(filterSpec))
    // legacy 2.x `tags` map → grouping filters (the compatibility
    // rewrite OpenTSDB itself performs): value "*" → wildcard,
    // anything else → literal_or, both groupBy=true
    val tagFilters = Option(o.get("tags")).filter(_.isObject).toSeq
      .flatMap(_.properties().asScala.map { e =>
        val v = e.getValue.asText
        if (v == "*") TagFilterSpec("wildcard", e.getKey, "*", groupBy = true)
        else TagFilterSpec("literal_or", e.getKey, v, groupBy = true)
      })
    SubQuery(metric, agg, ds, rate, ro, filters ++ tagFilters)
  }

  /** The filter types [[TagFilters.toPredicate]] compiles — rejected
    * here, at the request edge, not at plan time (shared with the
    * GET-form parser, [[RequestQs]]). */
  private[tsdb] val FilterTypes = Set("literal_or", "not_literal_or",
    "iliteral_or", "not_iliteral_or", "wildcard", "iwildcard",
    "regexp", "regexp_ci")

  private def filterSpec(o: JsonNode): TagFilterSpec = {
    require(o.isObject, "each filter must be a JSON object")
    val t = str(o, "type")
    require(FilterTypes(t), s"unknown filter type: $t")
    TagFilterSpec(t, str(o, "tagk"), str(o, "filter"),
      groupBy = Option(o.get("groupBy")).exists(_.asBoolean(false)))
  }
}
