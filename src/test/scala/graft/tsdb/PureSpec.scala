package graft.tsdb

import org.scalacheck.Prop.forAll
import org.scalacheck.Test.{check, Parameters}
import org.scalatest.funsuite.AnyFunSuite

/** Pure (no-Spark) units: relative-time parsing, downsample specs,
  * glob→LIKE translation, the expression parser. */
class PureSpec extends AnyFunSuite {
  private val Now = 1706659200000L // 2024-01-31T00:00:00Z

  test("relative time: units") {
    assert(TimeParse.toAbsMs("1h-ago", Now) == Now - 3600000L)
    assert(TimeParse.toAbsMs("90s-ago", Now) == Now - 90000L)
    assert(TimeParse.toAbsMs("2d-ago", Now) == Now - 2 * 86400000L)
    assert(TimeParse.toAbsMs("1w-ago", Now) == Now - 7 * 86400000L)
    assert(TimeParse.toAbsMs("1n-ago", Now) == Now - 30 * 86400000L)
    assert(TimeParse.toAbsMs("1y-ago", Now) == Now - 365 * 86400000L)
  }

  test("absolute time: seconds are normalized to ms, ms pass through") {
    assert(TimeParse.toAbsMs("1706659200", Now) == Now)      // 10-digit s
    assert(TimeParse.toAbsMs("1706659200000", Now) == Now)   // 13-digit ms
  }

  test("relative time round-trip property") {
    val prop = forAll { (n0: Int) =>
      val n = math.abs(n0 % 10000) + 1
      TimeParse.toAbsMs(s"${n}m-ago", Now) == Now - n * 60000L
    }
    assert(check(Parameters.default, prop).passed)
  }

  test("downsample spec parsing") {
    assert(TimeParse.parseDownsample("1h-avg-zero") ==
      DownsampleSpec(3600000L, "avg", "zero"))
    assert(TimeParse.parseDownsample("30s-sum") ==
      DownsampleSpec(30000L, "sum", "none"))
    intercept[IllegalArgumentException](TimeParse.parseDownsample("bogus"))
  }

  test("glob → LIKE translation escapes metacharacters") {
    assert(TagFilters.glob2like("cli*") == "cli%")
    assert(TagFilters.glob2like("a?c") == "a_c")
    assert(TagFilters.glob2like("100%*") == "100\\%%")
    assert(TagFilters.glob2like("a_b*") == "a\\_b%")
  }

  test("expression parser: full pipeline") {
    val q = Expression.parse(
      "merge(sum, downsample(1h, avg, zero, query(click, {user=*, dc=east|west}, 2d)))", Now)
    assert(q.startMs == Now - 2 * 86400000L)
    assert(q.endMs == Now)
    val sub = q.queries.head
    assert(sub.metric == "click")
    assert(sub.aggregator == "sum")
    assert(sub.downsample.contains(DownsampleSpec(3600000L, "avg", "zero")))
    assert(sub.filters == Seq(
      TagFilterSpec("wildcard", "user", "*", groupBy = true),
      TagFilterSpec("literal_or", "dc", "east|west")))
  }

  test("expression parser: rate nesting and errors") {
    val q = Expression.parse(
      "merge(max, rate(true, 1000, null, downsample(1m, last, none, query(cpu, {}, 2h))))", Now)
    val sub = q.queries.head
    assert(sub.rate && sub.rateOptions == RateOptions(counter = true, Some(1000L), None))
    assert(sub.downsample.contains(DownsampleSpec(60000L, "last", "none")))
    intercept[Expression.ParseError](Expression.parse("merge(sum)", Now))
    intercept[Expression.ParseError](Expression.parse("downsample(1h, avg, none, query(a, {}, 1h))", Now))
    intercept[Expression.ParseError](
      Expression.parse("merge(sum, query(a, {}, 1h)) trailing", Now))
  }

  test("expression parser: series arithmetic (binop nodes)") {
    import Expression._
    // a bare merge parses to a leaf — parseExpr generalizes parse
    assert(parseExpr("merge(sum, query(a, {}, 1h))", Now) match {
      case QueryNode(q) => q.queries.head.metric == "a"
      case _ => false
    })
    val n = parseExpr(
      "div(merge(sum, downsample(1h, avg, zero, query(click, {user=*}, 7d)))," +
        " merge(sum, downsample(1h, avg, zero, query(view, {user=*}, 7d))))", Now)
    n match {
      case BinOpNode("div", QueryNode(l), QueryNode(r)) =>
        assert(l.queries.head.metric == "click" && r.queries.head.metric == "view")
        // each leaf captured its OWN query()'s relative range
        assert(l.startMs == Now - 7 * 86400000L && r.startMs == Now - 7 * 86400000L)
      case other => fail(s"unexpected tree: $other")
    }
    // nesting: binops compose over binops
    val nested = parseExpr(
      "mul(div(merge(sum, query(a, {}, 1h)), merge(sum, query(b, {}, 2h)))," +
        " merge(max, query(c, {}, 3h)))", Now)
    nested match {
      case BinOpNode("mul", BinOpNode("div", QueryNode(a), QueryNode(b)), QueryNode(c)) =>
        assert(a.queries.head.metric == "a" && b.queries.head.metric == "b" &&
          c.queries.head.metric == "c")
        assert(b.startMs == Now - 2 * 3600000L && c.startMs == Now - 3 * 3600000L)
      case other => fail(s"unexpected tree: $other")
    }
    intercept[Expression.ParseError](
      parseExpr("div(merge(sum, query(a, {}, 1h)))", Now)) // arity
    intercept[Expression.ParseError](
      parseExpr("pow(merge(sum, query(a, {}, 1h)), merge(sum, query(b, {}, 1h)))", Now))
    // scalar operands: leading digit / sign / dot starts a literal
    assert(parseExpr("div(merge(sum, query(a, {}, 1h)), 3600)", Now) match {
      case BinOpNode("div", QueryNode(_), ScalarNode(v)) => v == 3600.0
      case _ => false
    })
    assert(parseExpr("mul(-0.5, merge(sum, query(a, {}, 1h)))", Now) match {
      case BinOpNode("mul", ScalarNode(v), QueryNode(_)) => v == -0.5
      case _ => false
    })
    intercept[Expression.ParseError](parseExpr("div(merge(sum, query(a, {}, 1h)), -)", Now))
    // unary abs: wraps any expr, composes with binops
    assert(parseExpr("abs(merge(sum, query(a, {}, 1h)))", Now) match {
      case UnOpNode("abs", QueryNode(q)) => q.queries.head.metric == "a"
      case _ => false
    })
    assert(parseExpr(
      "abs(sub(merge(sum, query(a, {}, 1h)), merge(sum, query(b, {}, 1h))))", Now) match {
      case UnOpNode("abs", BinOpNode("sub", QueryNode(_), QueryNode(_))) => true
      case _ => false
    })
    intercept[Expression.ParseError]( // abs is unary, not a binop
      parseExpr("abs(merge(sum, query(a, {}, 1h)), merge(sum, query(b, {}, 1h)))", Now))
    // shift: parses a duration arg; shiftRanges re-aims every leaf
    parseExpr("shift(merge(sum, query(a, {}, 7d)), 7d)", Now) match {
      case ShiftNode(d, QueryNode(q)) =>
        assert(d == 7 * 86400000L)
        assert(q.startMs == Now - 7 * 86400000L && q.endMs == Now)
        Expression.shiftRanges(QueryNode(q), d) match {
          case QueryNode(p) =>
            assert(p.startMs == Now - 14 * 86400000L && p.endMs == Now - 7 * 86400000L)
          case other => fail(s"unexpected: $other")
        }
      case other => fail(s"unexpected tree: $other")
    }
    intercept[Expression.ParseError]( // shift needs its duration
      parseExpr("shift(merge(sum, query(a, {}, 7d)))", Now))
  }

  test("expression parser: topn node") {
    import Expression._
    parseExpr("topn(5, avg, merge(sum, query(a, {u=*}, 7d)))", Now) match {
      case TopNNode(5, "avg", QueryNode(q)) =>
        assert(q.queries.head.metric == "a")
      case other => fail(s"unexpected tree: $other")
    }
    // composes over arbitrary inner expressions
    parseExpr("topn(3, max, div(merge(sum, query(a, {u=*}, 1h))," +
      " merge(sum, query(b, {u=*}, 1h))))", Now) match {
      case TopNNode(3, "max", BinOpNode("div", QueryNode(_), QueryNode(_))) =>
      case other => fail(s"unexpected tree: $other")
    }
    // n must be a positive integer literal
    intercept[Expression.ParseError](
      parseExpr("topn(0, avg, merge(sum, query(a, {u=*}, 1h)))", Now))
    intercept[Expression.ParseError](
      parseExpr("topn(2.5, avg, merge(sum, query(a, {u=*}, 1h)))", Now))
    intercept[Expression.ParseError](
      parseExpr("topn(-1, avg, merge(sum, query(a, {u=*}, 1h)))", Now))
    // shiftRanges recurses through topn
    shiftRanges(parseExpr("topn(2, sum, merge(sum, query(a, {u=*}, 1h)))", Now),
      3600000L) match {
      case TopNNode(2, "sum", QueryNode(q)) =>
        assert(q.endMs == Now - 3600000L)
      case other => fail(s"unexpected tree: $other")
    }
  }
  test("wire JSON: full request parses to the typed model") {
    val q = RequestJson.parse(
      """{"start": "30d-ago", "end": 1706659200,
          "queries": [{"metric": "click", "aggregator": "sum",
                       "downsample": "1h-avg-zero", "rate": true,
                       "rateOptions": {"counter": true, "counterMax": 1000,
                                       "resetValue": 5},
                       "filters": [{"type": "wildcard", "tagk": "user",
                                    "filter": "1*", "groupBy": true},
                                   {"type": "regexp", "tagk": "host",
                                    "filter": "web[0-9]+"}]}]}""", Now)
    assert(q.startMs == Now - 30 * 86400000L)
    assert(q.endMs == Now) // epoch seconds normalized to ms
    val sub = q.queries.head
    assert(sub.metric == "click" && sub.aggregator == "sum")
    assert(sub.downsample.contains(DownsampleSpec(3600000L, "avg", "zero")))
    assert(sub.rate)
    assert(sub.rateOptions == RateOptions(counter = true,
      counterMax = Some(1000L), resetValue = Some(5L)))
    assert(sub.filters == Seq(
      TagFilterSpec("wildcard", "user", "1*", groupBy = true),
      TagFilterSpec("regexp", "host", "web[0-9]+")))
  }

  test("wire JSON: end defaults to now; numeric ms start passes through") {
    val q = RequestJson.parse(
      s"""{"start": ${Now - 3600000L},
           "queries": [{"metric": "m", "aggregator": "avg"}]}""", Now)
    assert(q.startMs == Now - 3600000L && q.endMs == Now)
    assert(q.queries.head.downsample.isEmpty && !q.queries.head.rate)
  }

  test("wire JSON: legacy tags map becomes groupBy filters") {
    val q = RequestJson.parse(
      """{"start": "1h-ago",
          "queries": [{"metric": "m", "aggregator": "max",
                       "tags": {"host": "web01|web02", "dc": "*"}}]}""", Now)
    val fs = q.queries.head.filters
    assert(fs.contains(TagFilterSpec("literal_or", "host", "web01|web02",
      groupBy = true)))
    assert(fs.contains(TagFilterSpec("wildcard", "dc", "*", groupBy = true)))
  }

  test("wire JSON: malformed requests are 400s, not planner crashes") {
    def bad(body: String): Unit =
      intercept[IllegalArgumentException](RequestJson.parse(body, Now))
    bad("{not json")                                        // malformed JSON
    bad("[]")                                               // not an object
    bad("""{"queries": [{"metric": "m", "aggregator": "sum"}]}""") // no start
    bad("""{"start": "1h-ago"}""")                          // no queries
    bad("""{"start": "1h-ago", "queries": []}""")           // empty queries
    bad("""{"start": "1h-ago", "queries": [{"aggregator": "sum"}]}""") // no metric
    bad("""{"start": "1h-ago", "queries": [{"metric": "m"}]}""") // no aggregator
    bad("""{"start": "1h-ago", "end": "2h-ago",
           "queries": [{"metric": "m", "aggregator": "sum"}]}""") // end <= start
    bad("""{"start": "1h-ago",
           "queries": [{"metric": "m", "aggregator": "sum",
                        "filters": [{"type": "bogus_type", "tagk": "u",
                                     "filter": "x"}]}]}""")  // unknown filter
    bad("""{"start": "1h-ago",
           "queries": [{"metric": "m", "aggregator": "sum",
                        "downsample": "bogus"}]}""")         // bad downsample
  }

  test("wire JSON fuzz: arbitrary input either parses or raises the 400 analog") {
    // a request body from the network must NEVER surface anything but
    // IllegalArgumentException — any other throwable is a 500, a bug
    val prop = forAll { (s: String) =>
      try { RequestJson.parse(s, Now); true }
      catch {
        case _: IllegalArgumentException => true
        case _: Throwable => false
      }
    }
    assert(check(Parameters.default, prop).passed)
  }

  test("GET query string: full request parses to the typed model") {
    val q = RequestQs.parse(
      "start=30d-ago&end=1706659200&" +
        "m=sum:1h-avg-zero:rate%7Bcounter,1000,5%7D:click" +
        "%7Buser=wildcard(1*),host=regexp(web[0-9]:8080)%7D" +
        "%7Bdc=*%7D", Now)
    assert(q.startMs == Now - 30 * 86400000L)
    assert(q.endMs == Now) // epoch seconds normalized to ms
    val sub = q.queries.head
    assert(sub.metric == "click" && sub.aggregator == "sum")
    assert(sub.downsample.contains(DownsampleSpec(3600000L, "avg", "zero")))
    assert(sub.rate)
    assert(sub.rateOptions == RateOptions(counter = true,
      counterMax = Some(1000L), resetValue = Some(5L)))
    // first brace group groups; second doesn't; the regexp's colon
    // must survive the m-token split
    assert(sub.filters == Seq(
      TagFilterSpec("wildcard", "user", "1*", groupBy = true),
      TagFilterSpec("regexp", "host", "web[0-9]:8080", groupBy = true),
      TagFilterSpec("wildcard", "dc", "*")))
  }

  test("GET query string: legacy bare tag values get the documented conversion") {
    val q = RequestQs.parse(
      "start=1h-ago&m=max:m1{host=web01|web02,dc=*,rack=r*}", Now)
    assert(q.queries.head.filters == Seq(
      TagFilterSpec("literal_or", "host", "web01|web02", groupBy = true),
      TagFilterSpec("wildcard", "dc", "*", groupBy = true),
      TagFilterSpec("iwildcard", "rack", "r*", groupBy = true)))
    assert(q.endMs == Now) // end defaults to pinned now
    // repeated m= parameters stack in order
    val q2 = RequestQs.parse("start=1h-ago&m=sum:a&m=max:1h-avg:b", Now)
    assert(q2.queries.map(_.metric) == Seq("a", "b"))
    assert(q2.queries(1).downsample.contains(DownsampleSpec(3600000L, "avg")))
  }

  test("GET query string: malformed requests are 400s, not planner crashes") {
    def bad(qs: String): Unit =
      intercept[IllegalArgumentException](RequestQs.parse(qs, Now))
    bad("m=sum:click")                        // no start
    bad("start=1h-ago")                       // no m
    bad("start=1h-ago&end=2h-ago&m=sum:a")    // end <= start
    bad("start=1h-ago&m=click")               // no aggregator separator
    bad("start=1h-ago&m=sum:")                // empty metric
    bad("start=1h-ago&m=:click")              // empty aggregator
    bad("start=1h-ago&m=sum:1h-avg:1h-max:a") // duplicate downsample
    bad("start=1h-ago&m=sum:rate:rate:a")     // duplicate rate
    bad("start=1h-ago&m=sum:bogus:a")         // bad downsample token
    bad("start=1h-ago&m=sum:rate{pizza}:a")   // unknown rate option
    bad("start=1h-ago&m=sum:rate{counter,x}:a") // non-integer counterMax
    bad("start=1h-ago&m=sum:a{u=bogus_type(x)}") // unknown filter fn
    bad("start=1h-ago&m=sum:a{u=literal_or()}")  // empty filter value
    bad("start=1h-ago&m=sum:a{u=1")           // unbalanced braces
    bad("start=1h-ago&m=sum:a{u=1}x")         // trailing junk after braces
    bad("start=1h-ago&m=sum:a{u=1}{v=2}{w=3}") // three brace groups
    bad("start=bogus&m=sum:a")                // unparseable time
    bad("start=1h-ago&m=sum:a&%zz=1")         // bad percent-encoding
    bad("start=1h-ago&m=sum:rate{dropcounter}:a") // unmodeled semantics → 400
  }

  test("GET query string: regexp values keep quantifier braces and commas") {
    // r13 review: the naive group scan rejected {m,n} quantifiers as
    // "nested braces" and split paren-enclosed commas into bogus
    // filters that parsed SILENTLY — both now depth-aware
    val q = RequestQs.parse(
      "start=1h-ago&m=sum:a{host=regexp(web[0-9]{1,3}:80),dc=*}", Now)
    assert(q.queries.head.filters == Seq(
      TagFilterSpec("regexp", "host", "web[0-9]{1,3}:80", groupBy = true),
      TagFilterSpec("wildcard", "dc", "*", groupBy = true)))
    val q2 = RequestQs.parse(
      "start=1h-ago&m=sum:a{host=literal_or(a,x=y)}", Now)
    assert(q2.queries.head.filters == Seq(
      TagFilterSpec("literal_or", "host", "a,x=y", groupBy = true)),
      "a comma inside the filter function must not fabricate a second filter")
    // ADVICE r13: a paren in a BARE value is literal text, not a comma
    // shield — {u=a(1,v=2} is TWO filters, not one literal_or "a(1,v=2"
    val q3 = RequestQs.parse("start=1h-ago&m=sum:a{u=a(1,v=2}", Now)
    assert(q3.queries.head.filters == Seq(
      TagFilterSpec("literal_or", "u", "a(1", groupBy = true),
      TagFilterSpec("literal_or", "v", "2", groupBy = true)))
    // and an OPENED recognized function that never closes is a 400,
    // not a silent literal_or swallow of everything after it
    intercept[IllegalArgumentException](
      RequestQs.parse("start=1h-ago&m=sum:a{u=regexp(ab,v=2}", Now))
  }

  test("GET ≡ POST: the shared grammar parses to the same typed request") {
    // one property drives both parsers from the same randomized spec —
    // a drift in either (time handling, groupBy split, rate options,
    // filter types) fails here without needing the oracle
    val types = RequestJson.FilterTypes.toVector
    val prop = forAll { (nHours0: Int, agg0: Int, rate: Boolean,
                         ftype0: Int, groupBy: Boolean, cmax0: Long) =>
      val nHours = math.abs(nHours0 % 720) + 2
      val agg = Vector("sum", "avg", "max", "min")(math.abs(agg0 % 4))
      val ftype = types(math.abs(ftype0 % types.size))
      val cmax = math.abs(cmax0 % 100000) + 1
      val rateQs =
        if (rate) s"rate%7Bcounter,$cmax%7D:" else ""
      val rateJson =
        if (rate) s""""rate": true, "rateOptions": {"counter": true, "counterMax": $cmax},"""
        else ""
      val fjson =
        s"""{"type": "$ftype", "tagk": "user", "filter": "1*",
             "groupBy": $groupBy}"""
      val qsFilters =
        if (groupBy) s"%7Buser=$ftype(1*)%7D" else s"%7B%7D%7Buser=$ftype(1*)%7D"
      val fromQs = RequestQs.parse(
        s"start=${nHours}h-ago&m=$agg:1h-avg:${rateQs}click$qsFilters", Now)
      val fromJson = RequestJson.parse(
        s"""{"start": "${nHours}h-ago",
             "queries": [{"metric": "click", "aggregator": "$agg",
                          "downsample": "1h-avg", $rateJson
                          "filters": [$fjson]}]}""", Now)
      fromQs == fromJson
    }
    assert(check(Parameters.default, prop).passed)
  }

  test("GET query string fuzz: arbitrary input either parses or raises the 400 analog") {
    val prop = forAll { (s: String) =>
      try { RequestQs.parse(s, Now); true }
      catch {
        case _: IllegalArgumentException => true
        case _: Throwable => false
      }
    }
    assert(check(Parameters.default, prop).passed)
    // and structured near-miss fuzz around the m grammar, where random
    // strings rarely reach: mutate a valid m with junk at a random cut
    val prop2 = forAll { (cut0: Int, junk: String) =>
      val base = "start=1h-ago&m=sum:1h-avg:rate{counter}:click{user=wildcard(1*)}{dc=*}"
      val cut = math.abs(cut0 % base.length)
      val s = base.substring(0, cut) + junk + base.substring(cut)
      try { RequestQs.parse(s, Now); true }
      catch {
        case _: IllegalArgumentException => true
        case _: Throwable => false
      }
    }
    assert(check(Parameters.default, prop2).passed)
  }
}
