package graft.tsdb

/** OpenTSDB-style time + downsample spec parsing (pure Scala, no Spark).
  * Relative times: `<n><unit>-ago` with units ms s m h d w n(=30d) y(=365d).
  * Downsample specs: `<interval>-<aggregator>[-<fillpolicy>]`, e.g.
  * `1h-avg-zero`. "now" is always passed in (D5: pinned constant in
  * queries, never wall-clock).
  */
object TimeParse {
  private val Relative = """^(\d+)(ms|s|m|h|d|w|n|y)-ago$""".r
  private val Duration = """^(\d+)(ms|s|m|h|d|w|n|y)$""".r

  def unitMs(u: String): Long = u match {
    case "ms" => 1L
    case "s"  => 1000L
    case "m"  => 60L * 1000
    case "h"  => 3600L * 1000
    case "d"  => 86400L * 1000
    case "w"  => 7L * 86400 * 1000
    case "n"  => 30L * 86400 * 1000
    case "y"  => 365L * 86400 * 1000
    case _    => throw new IllegalArgumentException(s"bad time unit: $u")
  }

  def durationMs(spec: String): Long = spec match {
    case Duration(n, u) => n.toLong * unitMs(u)
    case _ => throw new IllegalArgumentException(s"bad duration: $spec")
  }

  /** `"1h-ago"` → absolute epoch ms relative to `nowMs`; absolute numeric
    * strings pass through (s or ms — OpenTSDB accepts both; 13+ digits or
    * values past year-2286-in-seconds are taken as ms). */
  def toAbsMs(spec: String, nowMs: Long): Long = spec match {
    case Relative(n, u) => nowMs - n.toLong * unitMs(u)
    case s if s.nonEmpty && s.length <= 17 && s.forall(_.isDigit) =>
      val v = s.toLong
      if (s.length >= 13 || v > 9999999999L) v else v * 1000L
    case _ => throw new IllegalArgumentException(s"bad time spec: $spec")
  }

  /** `"1h-avg-zero"` → DownsampleSpec(3600000, avg, zero). Fill defaults
    * to `none` when omitted. */
  def parseDownsample(spec: String): DownsampleSpec = {
    spec.split("-").toList match {
      case ival :: agg :: Nil         => DownsampleSpec(durationMs(ival), agg, "none")
      case ival :: agg :: fill :: Nil => DownsampleSpec(durationMs(ival), agg, fill)
      case _ => throw new IllegalArgumentException(s"bad downsample spec: $spec")
    }
  }
}
