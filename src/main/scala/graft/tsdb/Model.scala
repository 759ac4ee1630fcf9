package graft.tsdb

/** Typed mirror of the mycenae/OpenTSDB data + query model (SURVEY §1.2,
  * §3.1 EP2). The query case classes are the planner input; the planner
  * compiles them to DataFrame pipelines — no custom Catalyst IR
  * (SURVEY §4.2).
  */

/** One datapoint (the `/api/put` wire format, normalized): numeric value
  * or text payload — exactly one of `value`/`text` is set. */
final case class Point(
    metric: String,
    tags: Map[String, String],
    ts_ms: Long,
    value: Option[Double],
    text: Option[String] = None)
final case class DownsampleSpec(
    intervalMs: Long,
    aggregator: String,        // sum | avg | min | max | count | first | last
    fill: String = "none")     // none | null | nan | zero

final case class RateOptions(
    counter: Boolean = false,
    counterMax: Option[Long] = None,
    resetValue: Option[Long] = None)

/** One OpenTSDB filter: type ∈ literal_or | not_literal_or | wildcard |
  * iwildcard | regexp; groupBy=true keeps the tag as a grouping key in the
  * merge stage (ungrouped filter tags end up in aggregateTags). */
final case class TagFilterSpec(
    ftype: String,
    tagk: String,
    filter: String,
    groupBy: Boolean = false)

final case class SubQuery(
    metric: String,
    aggregator: String,                    // cross-series merge aggregator
    downsample: Option[DownsampleSpec] = None,
    rate: Boolean = false,
    rateOptions: RateOptions = RateOptions(),
    filters: Seq[TagFilterSpec] = Nil)

final case class TsdbQuery(
    startMs: Long,
    endMs: Long,
    queries: Seq[SubQuery])
