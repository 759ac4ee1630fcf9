package graft.tsdb

/** EP3' — the `/api/query/expression` functional language (SURVEY §3.1):
  *
  *   merge(<agg>, downsample(<ival>-<agg>[-<fill>]?, rate(<ctr>,<max>,<reset>,)? query(<metric>, {k=v|v2, k2=*}, <relative>)))
  *
  *   merge(sum, downsample(1h, avg, none, query(click, {user=*}, 30d)))
  *   merge(max, rate(true, 1000, 0, downsample(1m, last, null, query(cpu, {}, 2h))))
  *
  * The stage ORDER is fixed: every expression normalizes into one
  * [[TsdbQuery]] and [[Pipeline.run]] always executes
  * downsample → merge → rate, regardless of how `rate(...)` and
  * `downsample(...)` are nested in the text (both parse into flags on
  * the same SubQuery). This matches the OpenTSDB request model, where
  * rate/downsample are properties of a (sub)query, not free-floating
  * operators; an expression nesting rate INSIDE downsample is accepted
  * and means the same normalized pipeline.
  *
  * A tag value of `*` marks the tag as a groupBy key (wildcard-all);
  * other values compile to literal_or filters. Pure recursive descent,
  * no Spark dependency — the output is a [[TsdbQuery]] for
  * [[Pipeline.run]].
  */
object Expression {

  final case class ParseError(msg: String, pos: Int)
    extends IllegalArgumentException(s"$msg at position $pos")

  /** Series-arithmetic AST: a leaf is one normalized pipeline, a binop
    * combines two sub-expressions point-wise on (group tags, bucket) —
    * the canonical TSDB expression use (error-rate = errors ÷ requests).
    * Evaluated by [[Pipeline.runExpr]]. */
  sealed trait ExprNode
  final case class QueryNode(q: TsdbQuery) extends ExprNode
  final case class BinOpNode(op: String, left: ExprNode, right: ExprNode) extends ExprNode
  /** Numeric literal operand (`div(merge(...), 3600)` — unit scaling);
    * evaluated map-side, never a join. Cannot be a whole expression. */
  final case class ScalarNode(v: Double) extends ExprNode
  /** Unary point-wise function (`abs(sub(a, b))` — OpenTSDB's
    * absolute()); pure map-side projection over the evaluated inner. */
  final case class UnOpNode(op: String, inner: ExprNode) extends ExprNode
  /** Time shift (OpenTSDB's timeShift): evaluate the inner expression
    * `deltaMs` earlier and relabel its buckets forward by the same
    * amount, so last week's series aligns point-wise with this week's —
    * `sub(a, shift(a, 7d))` is the canonical week-over-week delta.
    * The delta must be a multiple of the inner downsample interval or
    * the relabeled buckets won't land on the unshifted grid. */
  final case class ShiftNode(deltaMs: Long, inner: ExprNode) extends ExprNode
  /** Series top-N (OpenTSDB's topN): rank the inner expression's series
    * — its groupBy-tag combinations — by `agg` of their bucket values
    * and keep the n best. `topn(5, avg, merge(...))` = "the 5 series
    * with the highest average", the dashboard ask the plain
    * merge/downsample surface can't express. Evaluated by
    * [[TopN.apply]] over the merged frame: one series-cardinality
    * aggregate + a rank window, never a points-sized sort. */
  final case class TopNNode(n: Int, agg: String, inner: ExprNode) extends ExprNode

  /** Shift every leaf query's absolute range back by `d` — how a
    * ShiftNode re-aims its subtree before evaluation. */
  def shiftRanges(n: ExprNode, d: Long): ExprNode = n match {
    case QueryNode(q) => QueryNode(q.copy(startMs = q.startMs - d, endMs = q.endMs - d))
    case BinOpNode(op, l, r) => BinOpNode(op, shiftRanges(l, d), shiftRanges(r, d))
    case UnOpNode(op, e) => UnOpNode(op, shiftRanges(e, d))
    case ShiftNode(dd, e) => ShiftNode(dd, shiftRanges(e, d))
    case TopNNode(n, a, e) => TopNNode(n, a, shiftRanges(e, d))
    case s: ScalarNode => s
  }

  /** The supported point-wise combinators. */
  val BinOps: Set[String] = Set("add", "sub", "mul", "div")
  val UnOps: Set[String] = Set("abs")

  def parse(input: String, nowMs: Long): TsdbQuery = new P(input, nowMs).top()

  /** Full expression grammar:
    * `expr := merge(...) | add|sub|mul|div(expr, expr) | abs(expr) |
    * shift(expr, <dur>) | topn(<n>, <agg>, expr) | <number>` — each
    * merge leaf is a complete pipeline with its own query(...) time
    * range. */
  def parseExpr(input: String, nowMs: Long): ExprNode =
    new P(input, nowMs).topExpr()

  private final class P(s: String, nowMs: Long) {
    private var i = 0

    private def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    private def peek: Char = if (i < s.length) s(i) else '\u0000'
    private def expect(c: Char): Unit = {
      ws()
      if (peek != c) throw ParseError(s"expected '$c', found '$peek'", i)
      i += 1
    }
    private def ident(): String = {
      ws()
      val start = i
      while (i < s.length && (s(i).isLetterOrDigit || "._-*|".contains(s(i)))) i += 1
      if (i == start) throw ParseError("expected identifier", i)
      s.substring(start, i)
    }

    def top(): TsdbQuery = {
      val q = mergeExpr()
      ws()
      if (i != s.length) throw ParseError(s"trailing input '${s.substring(i)}'", i)
      q
    }

    def topExpr(): ExprNode = {
      val e = exprNode()
      ws()
      if (i != s.length) throw ParseError(s"trailing input '${s.substring(i)}'", i)
      e
    }

    // expr := merge(...) | <binop>(expr, expr) | <number>
    private def exprNode(): ExprNode = {
      ws()
      // identifiers may CONTAIN digits but never start with one, so a
      // leading digit / sign unambiguously starts a numeric literal
      if (peek == '-' || peek == '.' || peek.isDigit) return ScalarNode(number())
      val save = i
      val f = ident()
      if (BinOps(f)) {
        expect('('); val l = exprNode()
        expect(','); val r = exprNode(); expect(')')
        BinOpNode(f, l, r)
      } else if (UnOps(f)) {
        expect('('); val e = exprNode(); expect(')')
        UnOpNode(f, e)
      } else if (f == "shift") {
        expect('('); val e = exprNode()
        expect(','); val d = ident(); expect(')')
        ShiftNode(TimeParse.durationMs(d), e)
      } else if (f == "topn") {
        // topn(<n>, <agg>, <expr>) — n must be a positive integer; the
        // aggregator set is TopN's (avg|sum|max|min|last), validated at
        // evaluation so the parser stays Spark-free
        expect('('); val nv = number()
        if (nv <= 0 || nv != math.floor(nv))
          throw ParseError(s"topn needs a positive integer n, got $nv", i)
        expect(','); val agg = ident()
        expect(','); val e = exprNode(); expect(')')
        TopNNode(nv.toInt, agg, e)
      } else {
        i = save // mergeExpr re-reads its own leading identifier
        QueryNode(mergeExpr())
      }
    }

    private def number(): Double = {
      val start = i
      if (peek == '-') i += 1
      while (i < s.length && (s(i).isDigit || s(i) == '.')) i += 1
      val txt = s.substring(start, i)
      try txt.toDouble
      catch { case _: NumberFormatException =>
        throw ParseError(s"bad number '$txt'", start) }
    }

    // merge(<agg>, <downsample-or-rate-or-query>)
    private def mergeExpr(): TsdbQuery = {
      ws()
      val f = ident()
      if (f != "merge") throw ParseError(s"expected merge(...), got '$f'", i)
      expect('(')
      val agg = ident()
      expect(',')
      val inner = innerExpr()
      expect(')')
      val sub = inner.copy(aggregator = agg)
      // startMs is set by the query(...) leaf, which innerExpr() has
      // necessarily parsed by now (every branch bottoms out in query)
      TsdbQuery(startMs, nowMs, Seq(sub))
    }

    private var startMs: Long = nowMs

    // downsample(ival, agg, fill, <inner>) | rate(ctr, max, reset, <inner>) | query(...)
    private def innerExpr(): SubQuery = {
      ws()
      val f = ident()
      f match {
        case "downsample" =>
          expect('('); val ival = ident()
          expect(','); val agg = ident()
          expect(','); val fill = ident()
          expect(','); val inner = innerExpr(); expect(')')
          inner.copy(downsample = Some(
            DownsampleSpec(TimeParse.durationMs(ival), agg, fill)))
        case "rate" =>
          expect('('); val ctr = ident()
          expect(','); val max = ident()
          expect(','); val reset = ident()
          expect(','); val inner = innerExpr(); expect(')')
          inner.copy(rate = true, rateOptions = RateOptions(
            counter = ctr == "true",
            counterMax = if (max == "null" || max == "0") None else Some(max.toLong),
            resetValue = if (reset == "null" || reset == "0") None else Some(reset.toLong)))
        case "query" =>
          expect('('); val metric = ident()
          expect(','); val filters = tagBlock()
          expect(','); val rel = ident(); expect(')')
          startMs = TimeParse.toAbsMs(s"$rel-ago", nowMs)
          SubQuery(metric, "sum", filters = filters)
        case other => throw ParseError(s"unknown function '$other'", i)
      }
    }

    // {k=v|v2, k2=*} — '*' marks a groupBy tag
    private def tagBlock(): Seq[TagFilterSpec] = {
      expect('{')
      ws()
      if (peek == '}') { i += 1; return Nil }
      val buf = Seq.newBuilder[TagFilterSpec]
      var done = false
      while (!done) {
        val k = ident(); expect('='); val v = ident()
        buf += (if (v == "*") TagFilterSpec("wildcard", k, "*", groupBy = true)
                else TagFilterSpec("literal_or", k, v))
        ws()
        if (peek == ',') i += 1 else done = true
      }
      expect('}')
      buf.result()
    }
  }
}
