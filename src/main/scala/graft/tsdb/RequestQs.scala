package graft.tsdb

/** OpenTSDB `GET /api/query` query-string → [[TsdbQuery]] — the URI twin
  * of [[RequestJson]] (EP2 [PK-H]; the reference serves both forms off
  * one handler). Grammar per subquery parameter:
  *
  * {{{
  * start=<t>&end=<t>&m=<agg>:[<interval>-<agg>[-<fill>]:]
  *     [rate[{counter[,<max>[,<reset>]]}]:]<metric>[{<grouping>}][{<filters>}]
  * }}}
  *
  * - `start`/`end` accept epoch seconds, epoch millis, or relative
  *   `<n><unit>-ago` ([[TimeParse.toAbsMs]]); `end` defaults to the
  *   pinned `nowMs` (D5 — replayable, never wall-clock).
  * - downsample and rate tokens are accepted in EITHER order between
  *   the aggregator and the metric (OpenTSDB documents rate-first but
  *   its parser takes both; lenient here, like the POST parser's
  *   epoch-unit leniency).
  * - the FIRST brace group sets groupBy=true on its filters, the
  *   SECOND groupBy=false — the documented grouping/non-grouping split.
  * - brace entries take the 2.2+ filter-function syntax
  *   `tagk=type(value)` for any [[RequestJson.FilterTypes]] member, or
  *   the legacy bare forms with the documented conversion [PK-M]:
  *   `*` → wildcard, a value containing `*` → iwildcard, anything else
  *   (including `a|b` or-lists) → literal_or.
  * - repeated `m=` parameters form a multi-subquery request in
  *   parameter order (the OpenTSDB response-array order).
  *
  * Strict where a server must be strict — the 400 analog
  * (IllegalArgumentException) for: missing `start`, no `m` parameter,
  * empty aggregator/metric, unknown filter type or function, malformed
  * rate options, unbalanced braces, bad percent-encoding, `end <=
  * start`, duplicate rate/downsample tokens. A query string from the
  * network must never surface anything but the 400 analog
  * (property-tested like the POST parser). */
object RequestQs {

  def parse(qs: String, nowMs: Long): TsdbQuery = {
    // accept a bare query string or a full path?query URI
    val body = qs.indexOf('?') match {
      case -1 => qs
      case i  => qs.substring(i + 1)
    }
    val params: Seq[(String, String)] =
      body.split("&").toSeq.filter(_.nonEmpty).map { kv =>
        val i = kv.indexOf('=')
        require(i > 0, s"malformed query parameter (expected k=v): $kv")
        (decode(kv.substring(0, i)), decode(kv.substring(i + 1)))
      }
    def first(k: String): Option[String] =
      params.collectFirst { case (`k`, v) => v }
    val start = first("start").map(toMs(_, nowMs)).getOrElse(
      throw new IllegalArgumentException("missing required parameter: start"))
    val end = first("end").map(toMs(_, nowMs)).getOrElse(nowMs)
    require(end > start, s"end ($end) must be after start ($start)")
    val ms = params.collect { case ("m", v) => v }
    require(ms.nonEmpty, "at least one m= subquery parameter is required")
    TsdbQuery(start, end, ms.map(subQuery))
  }

  private def decode(s: String): String =
    try java.net.URLDecoder.decode(s, java.nio.charset.StandardCharsets.UTF_8)
    catch {
      case e: RuntimeException =>
        throw new IllegalArgumentException(s"bad percent-encoding: ${e.getMessage}")
    }

  /** [[TimeParse.toAbsMs]] with its errors normalized to the 400 analog
    * (the POST parser gets this for free from Jackson's field typing). */
  private def toMs(t: String, nowMs: Long): Long =
    try TimeParse.toAbsMs(t, nowMs)
    catch {
      case e: IllegalArgumentException => throw e
      case e: RuntimeException =>
        throw new IllegalArgumentException(s"bad time spec '$t': ${e.getMessage}")
    }

  private def subQuery(m: String): SubQuery = {
    val parts = splitTopLevel(m, ':')
    require(parts.length >= 2,
      s"m must be <aggregator>:[<downsample>:][rate:]<metric>[{...}]: $m")
    val agg = parts.head
    require(agg.nonEmpty && !agg.contains('{'), s"bad aggregator in m: $m")
    var ds: Option[DownsampleSpec] = None
    var rate = false
    var ro = RateOptions()
    parts.tail.dropRight(1).foreach { tok =>
      if (tok == "rate" || tok.startsWith("rate{")) {
        require(!rate, s"duplicate rate token in m: $m")
        rate = true
        ro = rateOptions(tok)
      } else {
        require(ds.isEmpty, s"duplicate downsample token in m: $m")
        ds = Some(parseDs(tok))
      }
    }
    val (metric, filters) = metricAndFilters(parts.last)
    SubQuery(metric, agg, ds, rate, ro, filters)
  }

  private def parseDs(tok: String): DownsampleSpec =
    try TimeParse.parseDownsample(tok)
    catch {
      case e: IllegalArgumentException => throw e
      case e: RuntimeException =>
        throw new IllegalArgumentException(s"bad downsample '$tok': ${e.getMessage}")
    }

  /** `rate` → defaults; `rate{counter[,max[,reset]]}` → counter rate
    * with wrap handling — empty positions keep their defaults
    * (`rate{counter,,0}` is the documented reset-only form). */
  private def rateOptions(tok: String): RateOptions = {
    if (tok == "rate") return RateOptions()
    require(tok.startsWith("rate{") && tok.endsWith("}"),
      s"malformed rate options: $tok")
    val fields = tok.substring(5, tok.length - 1).split(",", -1)
    require(fields.length <= 3,
      s"rate options take at most counter,max,reset: $tok")
    val counter = fields(0) match {
      case "" | "false" => false
      case "counter"    => true
      // dropcounter (drop negative deltas) is NOT modeled by
      // RateOptions / the rate stage — silently mapping it to counter
      // semantics would return wrong numbers; 400 is the honest answer
      case "dropcounter" =>
        throw new IllegalArgumentException(
          "dropcounter rate semantics are not supported")
      case other =>
        throw new IllegalArgumentException(s"unknown rate option: $other")
    }
    def num(i: Int): Option[Long] =
      if (fields.length > i && fields(i).nonEmpty)
        try Some(fields(i).toLong)
        catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"rate option position $i must be an integer: ${fields(i)}")
        }
      else None
    RateOptions(counter, num(1), num(2))
  }

  private def metricAndFilters(p: String): (String, Seq[TagFilterSpec]) = {
    val ob = p.indexOf('{')
    val metric = if (ob == -1) p else p.substring(0, ob)
    require(metric.nonEmpty, s"missing metric in m subquery: $p")
    if (ob == -1) return (metric, Nil)
    val groups = braceGroups(p.substring(ob))
    require(groups.length <= 2,
      s"at most two filter groups (grouping + non-grouping): $p")
    val fs = groups.zipWithIndex.flatMap { case (g, i) =>
      g.map(parseFilter(_, groupBy = i == 0))
    }
    (metric, fs)
  }

  /** Split `{a}{b}` into entry lists; strict on balance and trailing
    * junk. An empty group (`{}`) contributes no filters (the OpenTSDB
    * group-by-nothing form). Depth-aware on BOTH brace and paren
    * nesting, so a regexp value like `regexp(web[0-9]{1,3})` keeps its
    * quantifier braces and its comma (r13 review: the naive
    * indexOf('}') scan rejected legal quantifiers as "nested braces"
    * and the comma split mangled paren-enclosed values into bogus
    * filters that parsed SILENTLY). */
  private def braceGroups(s: String): Seq[Seq[String]] = {
    val out = Seq.newBuilder[Seq[String]]
    var i = 0
    while (i < s.length) {
      require(s.charAt(i) == '{', s"unexpected text outside braces: $s")
      var depth = 0
      var close = -1
      var k = i
      while (k < s.length && close == -1) {
        s.charAt(k) match {
          case '{' => depth += 1
          case '}' => depth -= 1; if (depth == 0) close = k
          case _ =>
        }
        k += 1
      }
      require(close != -1, s"unbalanced braces: $s")
      val body = s.substring(i + 1, close)
      out += (if (body.isEmpty) Nil else splitTopLevel(body, ',').toSeq)
      i = close + 1
    }
    out.result()
  }

  private def parseFilter(entry: String, groupBy: Boolean): TagFilterSpec = {
    val i = entry.indexOf('=')
    require(i > 0 && i < entry.length - 1, s"filter must be tagk=spec: $entry")
    val tagk = entry.substring(0, i)
    val v = entry.substring(i + 1)
    val fn = "^([A-Za-z_]+)\\((.*)\\)$".r
    v match {
      case fn(t, arg) if RequestJson.FilterTypes(t) =>
        require(arg.nonEmpty, s"empty filter value: $entry")
        TagFilterSpec(t, tagk, arg, groupBy)
      case fn(t, _) =>
        throw new IllegalArgumentException(s"unknown filter type: $t")
      case "*"                    => TagFilterSpec("wildcard", tagk, "*", groupBy)
      case s if s.contains("*")   => TagFilterSpec("iwildcard", tagk, s, groupBy)
      case s                      => TagFilterSpec("literal_or", tagk, s, groupBy)
    }
  }

  /** Split on `sep` outside `{}` and outside RECOGNIZED `type(...)`
    * filter functions — a regexp value can carry colons, commas, and
    * `{m,n}` quantifiers (`regexp(web[0-9]{1,3}:80)`), so those must
    * not split. Strict on unbalanced braces AND on an unclosed
    * recognized function. A paren in a BARE value is literal text, not
    * nesting (ADVICE r13: `{u=a(1,v=2}` must split into two filters,
    * not silently parse as one literal_or `a(1,v=2`), so only a '('
    * immediately following `=<known-filter-type>` opens a shield.
    * Consequence: inside a shielded regexp arg, parens must balance —
    * write an unmatched literal paren as a class (`[(]`), not `\(`;
    * the parser is documented strict at the request edge. */
  private def splitTopLevel(s: String, sep: Char): Array[String] = {
    val parts = Array.newBuilder[String]
    val cur = new StringBuilder
    var braces = 0
    var parens = 0
    // true iff cur ends with `=<ident>` where <ident> is a known filter
    // function name — the only place '(' means nesting in this grammar
    def fnOpen: Boolean = {
      val t = cur.reverseIterator.takeWhile(c => c.isLetter || c == '_').length
      t > 0 && cur.length > t && cur.charAt(cur.length - t - 1) == '=' &&
        RequestJson.FilterTypes(cur.substring(cur.length - t))
    }
    s.foreach {
      case '{' => braces += 1; cur += '{'
      case '}' =>
        braces -= 1
        require(braces >= 0, s"unbalanced braces: $s")
        cur += '}'
      case '(' =>
        if (parens > 0 || fnOpen) parens += 1
        cur += '('
      case ')' =>
        if (parens > 0) parens -= 1
        cur += ')'
      case c if c == sep && braces == 0 && parens == 0 =>
        parts += cur.result(); cur.clear()
      case c => cur += c
    }
    require(braces == 0, s"unbalanced braces: $s")
    require(parens == 0,
      s"unclosed filter function: $s (a literal '(' inside a filter value " +
        "must be written as the class [(] — see the splitTopLevel grammar)")
    parts += cur.result()
    parts.result()
  }
}
