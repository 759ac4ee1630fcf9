package graft.rel

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.G set operations + §2.H scalar-function families (one composite
  * query per family — string/like/date/math/array/HOF/explode/map/json/
  * conditional/hash). Everything is built-in `functions._` (codegen'd);
  * no UDFs anywhere in this module.
  */
object SetsFns {
  type Q = (SparkSession, String) => DataFrame

  private def clickUsers(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).where(col("event_type") === "click")
      .select("user_id").distinct()
  private def viewUsers(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).where(col("event_type") === "view")
      .select("user_id").distinct()

  val queries: Map[String, Q] = graft.core.Reg.uniqueMap(
    "set_union_all" -> ((s, dir) =>
      clickUsers(s, dir).withColumn("src", lit("click"))
        .unionByName(viewUsers(s, dir).withColumn("src", lit("view")))
        .orderBy("user_id", "src")),

    "set_union_distinct" -> ((s, dir) =>
      clickUsers(s, dir).union(viewUsers(s, dir)).distinct().orderBy("user_id")),

    "set_intersect" -> ((s, dir) =>
      clickUsers(s, dir).intersect(viewUsers(s, dir)).orderBy("user_id")),

    // click users minus HEAVY viewers (≥15 views): every click user also
    // views in the dense fixture, so the plain click∖view difference is
    // empty and a 0-row match proves nothing about EXCEPT semantics
    "set_except" -> ((s, dir) => {
      val heavyViewers = Tables.events(s, dir)
        .where(col("event_type") === "view")
        .groupBy("user_id").agg(count(lit(1)).as("n"))
        .where(col("n") >= 15).select("user_id")
      clickUsers(s, dir).except(heavyViewers).orderBy("user_id")
    }),

    // bag difference (EXCEPT ALL): each click occurrence cancels ONE
    // view occurrence of the same user — multiset semantics where the
    // distinct EXCEPT would erase multiplicity. Spark plans it as one
    // co-partitioned count-diff aggregate, not a per-row anti join.
    "set_except_all" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val views = e.where(col("event_type") === "view").select("user_id")
      val clicks = e.where(col("event_type") === "click").select("user_id")
      views.exceptAll(clicks)
        .groupBy("user_id").agg(count(lit(1)).as("surplus"))
        .orderBy("user_id")
    }),

    "fn_string" -> ((s, dir) =>
      Tables.part(s, dir).select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        length(col("p_name")).cast("long").as("len"),
        substring(col("p_name"), 1, 5).as("sub"),
        trim(concat(lit("  "), col("p_name"), lit(" "))).as("trimmed"),
        lpad(col("p_brand"), 10, "*").as("pad"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devowel"),
        regexp_extract(col("p_name"), "^(\\w+) ", 1).as("first_word"),
        concat_ws("|", col("p_brand"), col("p_type")).as("cw"),
        // '|'-joined rather than raw ARRAY: the driver's pandas-based
        // compare cannot sort array-valued cells (unhashable ndarray)
        array_join(split(col("p_name"), " "), "|").as("words"))
        .orderBy("p_partkey")),

    // bitwise surface: AND/OR/XOR, shifts, popcount — all map-side
    // integer codegen (hash-partitioner math, flag fields, bitmap
    // tricks live on these)
    "fn_bitwise" -> ((s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"),
        expr("user_id & 255").as("band"),
        expr("user_id | 4096").as("bor"),
        expr("user_id ^ event_id").as("bxor"),
        expr("shiftleft(user_id % 16, 3)").cast("long").as("shl"),
        expr("shiftright(event_id, 2)").as("shr"),
        bit_count(col("user_id")).cast("long").as("popcnt"))
        .orderBy("event_id")),

    // regexp surface: extract-all / first-match / replace-all (Spark's
    // Java regex and DuckDB's RE2 agree on this character-class subset;
    // fancy constructs — lookarounds, backrefs — deliberately excluded
    // from the portable surface). All map-side codegen'd string work.
    "fn_regexp" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      docs.select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit("[a-z]{6,}"), lit(0)))
          .cast("long").as("n_long"),
        regexp_extract(col("text"), "([a-z]{6,})", 1).as("first_long"),
        substring(regexp_replace(col("text"), "[a-z]{6,}", "_"), 1, 80)
          .as("masked_prefix"))
        .orderBy("doc_id")
    }),

    "fn_like" -> ((s, dir) =>
      Tables.part(s, dir).select(
        col("p_partkey"),
        col("p_type").like("ECO%").as("is_eco"),
        col("p_type").ilike("sta%").as("is_sta_i"),
        col("p_name").startsWith("red").as("sw"),
        col("p_name").endsWith("t").as("ew"),
        col("p_name").contains("widget").as("cont"))
        .orderBy("p_partkey")),

    "fn_date" -> ((s, dir) =>
      Tables.orders(s, dir).select(
        col("o_orderkey"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"),
        datediff(to_date(lit("2000-01-01")), col("o_orderdate")).cast("long").as("days_to_y2k"),
        date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("plus30"),
        (unix_timestamp(col("o_orderdate")) * 1000).as("epoch_ms"),
        date_format(make_date(year(col("o_orderdate")), month(col("o_orderdate")), lit(1)),
          "yyyy-MM-dd").as("made"))
        .orderBy("o_orderkey")),

    "fn_math" -> ((s, dir) =>
      Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("ab"),
        ceil(col("l_extendedprice")).cast("long").as("ce"),
        floor(col("l_extendedprice")).cast("long").as("fl"),
        graft.core.D.r4s(sqrt(col("l_quantity"))).as("sq"),
        graft.core.D.r4s(exp(col("l_discount"))).as("ex"),
        graft.core.D.r4s(log(col("l_extendedprice"))).as("ln_"),
        graft.core.D.r4s(log10(col("l_extendedprice"))).as("lg"),
        pow(col("l_quantity"), 2).as("pw"),
        pmod(col("l_orderkey"), lit(7)).as("pm"),
        signum(col("l_discount") - 0.05).cast("long").as("sg"),
        greatest(col("l_tax"), col("l_discount")).as("gr"),
        least(col("l_tax"), col("l_discount")).as("le"))
        .orderBy("l_orderkey", "l_linenumber", "ab", "ce", "fl", "sq", "ex",
          "ln_", "lg", "pw", "pm", "sg", "gr", "le")),

    "fn_array" -> ((s, dir) => {
      val words = split(col("text"), " ")
      // array results are '|'-joined to scalars (driver compare can't
      // sort array cells); the array ops themselves still execute
      Tables.documents(s, dir).select(
        col("doc_id"),
        size(words).cast("long").as("n_words"),
        array_join(slice(words, 1, 3), "|").as("first3"),
        array_join(sort_array(slice(words, 1, 5)), "|").as("sorted5"),
        size(array_distinct(words)).cast("long").as("n_distinct"),
        array_contains(words, "the").as("has_the"),
        array_join(expr("transform(sequence(1L, 3L), x -> cast(x as string))"), "|").as("seq3"))
        .orderBy("doc_id")
    }),

    "fn_array_hof" -> ((s, dir) =>
      Tables.embeddings(s, dir).select(
        col("vec_id"),
        expr("""CAST(aggregate(embedding, CAST(0.0 AS DECIMAL(38,4)),
                 (acc, x) -> CAST(acc + CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                                             AS DECIMAL(18,4)) AS DECIMAL(38,4)))
                 AS DOUBLE)""").as("dot_self"),
        expr("""CAST(aggregate(zip_with(embedding, reverse(embedding),
                 (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                 CAST(0.0 AS DECIMAL(38,4)),
                 (acc, p) -> CAST(acc + CAST(p AS DECIMAL(18,4)) AS DECIMAL(38,4)))
                 AS DOUBLE)""").as("dot_rev"),
        expr("size(filter(embedding, x -> x > CAST(0.5 AS FLOAT)))")
          .cast("long").as("n_gt_half"),
        // sample two transform() outputs as scalars — double arrays can't
        // be emitted (driver compare) and stringifying doubles is
        // format-fragile across engines
        expr("element_at(transform(embedding, x -> round((CAST(x AS DOUBLE) * 2) * 10000.0, 0) / 10000.0 + 0.0), 1)").as("scaled_1"),
        expr("element_at(transform(embedding, x -> round((CAST(x AS DOUBLE) * 2) * 10000.0, 0) / 10000.0 + 0.0), 33)").as("scaled_33"))
        .withColumn("norm", graft.core.D.r4s(sqrt(col("dot_self"))))
        .orderBy("vec_id")),

    "fn_explode" -> ((s, dir) =>
      Tables.embeddings(s, dir)
        .select(col("vec_id"), posexplode(slice(col("embedding"), 1, 8)))
        .select(col("vec_id"), col("pos").cast("long").as("pos"),
          col("col").cast("double").as("comp"))
        .orderBy("vec_id", "pos")),

    "fn_map" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("tags", from_json(col("props"), org.apache.spark.sql.types.DataType.fromDDL("MAP<STRING,INT>")))
        .select(
          col("event_id"),
          array_join(map_keys(col("tags")), "|").as("mk"),
          expr("array_join(transform(map_values(tags), v -> cast(v as string)), '|')").as("mv"),
          element_at(col("tags"), "k").as("el"),
          array_join(map_keys(map_filter(map(lit("a"), lit(1), lit("b"), lit(2)),
            (_, v) => v > 1)), "|").as("fk"))
        .orderBy("event_id")),

    "fn_json" -> ((s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        from_json(col("props"), org.apache.spark.sql.types.DataType.fromDDL("k INT")).getField("k").as("k_int"),
        to_json(struct(from_json(col("props"), org.apache.spark.sql.types.DataType.fromDDL("k INT")).getField("k").as("k"))).as("rebuilt"))
        .orderBy("event_id")),

    // URL parsing surface (web-corpus pipelines live on this): native
    // parse_url over a deterministically assembled URL — scheme-host /
    // path / one query parameter; all map-side codegen, mirrored by
    // regexp extraction in the oracle.
    "fn_url" -> ((s, dir) =>
      Tables.documents(s, dir).select(col("doc_id"),
          concat(lit("https://data.example.com/"), col("source"),
            lit("/doc-"), col("doc_id"), lit("?lang="), col("lang"),
            lit("&v=2")).as("url"))
        .select(col("doc_id"), col("url"),
          expr("parse_url(url, 'HOST')").as("host"),
          expr("parse_url(url, 'PATH')").as("path"),
          expr("parse_url(url, 'QUERY', 'lang')").as("q_lang"))
        .orderBy("doc_id")),

    "fn_conditional" -> ((s, dir) =>
      Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        when(col("l_discount") < 0.03, "low")
          .when(col("l_discount") < 0.07, "mid")
          .otherwise("high").as("band"),
        coalesce(nullif(col("l_returnflag"), lit("N")), lit("none")).as("co"),
        when(col("l_quantity") > 25, 1L).otherwise(0L).as("iv"))
        .orderBy("l_orderkey", "l_linenumber", "band", "co", "iv")),

    // scalar UDF surface (§2.L) — prefer built-ins everywhere else; this
    // demonstrates registration. glob2like on metachar-free names reduces
    // to appending '%', which the oracle can mirror.
    "udf_scalar" -> ((s, dir) => {
      val glob2like = udf((g: String) => graft.tsdb.TagFilters.glob2like(g))
      Tables.part(s, dir)
        .select(col("p_partkey"), glob2like(concat(col("p_name"), lit("*"))).as("pat"))
        .orderBy("p_partkey")
    }),

    // error-tolerant casting (ANSI-mode safety valve): TRY_CAST yields
    // null instead of failing the job on malformed input — a
    // deterministic third of the strings are corrupted, and the parse /
    // reject counts plus the exact sum of parsed values are oracled.
    // Integer-only strings: double→string formatting is NOT
    // engine-portable, BIGINT→string is.
    "fn_try_cast" -> ((s, dir) => {
      Tables.events(s, dir)
        .withColumn("sv", expr(
          "CASE WHEN event_id % 3 = 0 THEN concat('u', CAST(user_id AS STRING)) " +
          "ELSE CAST(user_id AS STRING) END"))
        .withColumn("parsed", expr("try_cast(sv AS BIGINT)"))
        .groupBy("event_type")
        .agg(count(col("parsed")).as("n_parsed"),
          count(when(col("parsed").isNull, 1)).as("n_rejected"),
          sum(col("parsed")).as("sum_parsed"))
        .orderBy("event_type")
    }),

    // portable digests (md5/sha256 are bit-identical across engines →
    // full DuckDB oracle)
    "fn_hash" -> ((s, dir) =>
      Tables.part(s, dir).select(
        col("p_partkey"),
        md5(col("p_name").cast("binary")).as("m5"),
        sha2(col("p_name").cast("binary"), 256).as("s2"))
        .orderBy("p_partkey")),

    // engine-specific hash implementations — golden-value test, no oracle
    "fn_hash_native" -> ((s, dir) =>
      Tables.part(s, dir).select(
        col("p_partkey"),
        xxhash64(col("p_name")).as("xx"),
        crc32(col("p_name").cast("binary")).as("crc"))
        .orderBy("p_partkey"))
  )

  val oracleSql: Map[String, String] = graft.core.Reg.uniqueMap(
    "set_union_all" ->
      """WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
            v AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view')
         SELECT user_id, 'click' AS src FROM c
         UNION ALL SELECT user_id, 'view' AS src FROM v
         ORDER BY user_id, src""",

    "set_union_distinct" ->
      """SELECT DISTINCT user_id FROM events
         WHERE event_type IN ('click', 'view') ORDER BY user_id""",

    "set_intersect" ->
      """SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
         INTERSECT
         SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
         ORDER BY user_id""",

    "set_except" ->
      """SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
         EXCEPT
         SELECT user_id FROM events WHERE event_type = 'view'
         GROUP BY user_id HAVING count(*) >= 15
         ORDER BY user_id""",

    "set_except_all" ->
      """WITH d AS (SELECT user_id FROM events WHERE event_type = 'view'
                    EXCEPT ALL
                    SELECT user_id FROM events WHERE event_type = 'click')
         SELECT user_id, count(*) AS surplus
         FROM d GROUP BY 1 ORDER BY 1""",

    "fn_string" ->
      """SELECT p_partkey, upper(p_name) AS up, length(p_name) AS len,
            substring(p_name, 1, 5) AS sub,
            trim('  ' || p_name || ' ') AS trimmed,
            lpad(p_brand, 10, '*') AS pad,
            regexp_replace(p_name, '[aeiou]', '_', 'g') AS devowel,
            regexp_extract(p_name, '^(\w+) ', 1) AS first_word,
            concat_ws('|', p_brand, p_type) AS cw,
            array_to_string(string_split(p_name, ' '), '|') AS words
         FROM part ORDER BY p_partkey""",

    // mirror of fn_bitwise (DuckDB's ^ is exponent — xor() is the
    // function; shifts are << / >>)
    "fn_bitwise" ->
      """SELECT event_id,
            user_id & 255 AS band,
            user_id | 4096 AS bor,
            xor(user_id, event_id) AS bxor,
            CAST((user_id % 16) << 3 AS BIGINT) AS shl,
            event_id >> 2 AS shr,
            CAST(bit_count(user_id) AS BIGINT) AS popcnt
         FROM events ORDER BY event_id""",

    // mirror of fn_regexp (DuckDB replace needs the explicit 'g' flag
    // to match Spark's replace-all default; no-match extract is '' on
    // both engines)
    "fn_regexp" ->
      """SELECT doc_id,
            CAST(len(regexp_extract_all(text, '[a-z]{6,}')) AS BIGINT) AS n_long,
            regexp_extract(text, '([a-z]{6,})', 1) AS first_long,
            left(regexp_replace(text, '[a-z]{6,}', '_', 'g'), 80) AS masked_prefix
         FROM documents ORDER BY doc_id""",

    "fn_like" ->
      """SELECT p_partkey, p_type LIKE 'ECO%' AS is_eco,
            p_type ILIKE 'sta%' AS is_sta_i,
            starts_with(p_name, 'red') AS sw,
            ends_with(p_name, 't') AS ew,
            contains(p_name, 'widget') AS cont
         FROM part ORDER BY p_partkey""",

    "fn_date" ->
      """SELECT o_orderkey,
            strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
            CAST(year(o_orderdate) AS BIGINT) AS yr,
            CAST(month(o_orderdate) AS BIGINT) AS mo,
            CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
            CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS BIGINT) AS days_to_y2k,
            strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30,
            epoch_ms(o_orderdate) AS epoch_ms,
            strftime(make_date(CAST(year(o_orderdate) AS INT), CAST(month(o_orderdate) AS INT), 1), '%Y-%m-%d') AS made
         FROM orders ORDER BY o_orderkey""",

    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
            abs(l_discount - 0.05) AS ab,
            CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
            CAST(floor(l_extendedprice) AS BIGINT) AS fl,
            ROUND(sqrt(l_quantity) * 10000.0, 0) / 10000.0 + 0.0 AS sq,
            ROUND(exp(l_discount) * 10000.0, 0) / 10000.0 + 0.0 AS ex,
            ROUND(ln(l_extendedprice) * 10000.0, 0) / 10000.0 + 0.0 AS ln_,
            ROUND(log10(l_extendedprice) * 10000.0, 0) / 10000.0 + 0.0 AS lg,
            pow(l_quantity, 2) AS pw,
            l_orderkey % 7 AS pm,
            CAST(sign(l_discount - 0.05) AS BIGINT) AS sg,
            greatest(l_tax, l_discount) AS gr,
            least(l_tax, l_discount) AS le
         FROM lineitem ORDER BY l_orderkey, l_linenumber, ab, ce, fl, sq, ex,
           ln_, lg, pw, pm, sg, gr, le""",

    "fn_array" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
         SELECT doc_id, CAST(len(words) AS BIGINT) AS n_words,
            array_to_string(words[1:3], '|') AS first3,
            array_to_string(list_sort(words[1:5]), '|') AS sorted5,
            CAST(len(list_distinct(words)) AS BIGINT) AS n_distinct,
            list_contains(words, 'the') AS has_the,
            '1|2|3' AS seq3
         FROM w ORDER BY doc_id""",

    "fn_array_hof" ->
      """WITH p AS (
           SELECT e.vec_id,
                  SUM(CAST(CAST(e.embedding[r.i] AS DOUBLE) * CAST(e.embedding[r.i] AS DOUBLE)
                      AS DECIMAL(18,4))) AS dot_dec,
                  SUM(CAST(CAST(e.embedding[r.i] AS DOUBLE) * CAST(e.embedding[65 - r.i] AS DOUBLE)
                      AS DECIMAL(18,4))) AS rev_dec,
                  CAST(SUM(CASE WHEN e.embedding[r.i] > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_gt_half
           FROM embeddings e, range(1, 65) r(i)
           GROUP BY e.vec_id),
         t AS (SELECT vec_id,
                  ROUND((CAST(embedding[1] AS DOUBLE) * 2) * 10000.0, 0) / 10000.0 + 0.0 AS scaled_1,
                  ROUND((CAST(embedding[33] AS DOUBLE) * 2) * 10000.0, 0) / 10000.0 + 0.0 AS scaled_33
               FROM embeddings)
         SELECT p.vec_id, CAST(p.dot_dec AS DOUBLE) AS dot_self,
                CAST(p.rev_dec AS DOUBLE) AS dot_rev,
                p.n_gt_half, t.scaled_1, t.scaled_33,
                ROUND(sqrt(CAST(p.dot_dec AS DOUBLE)) * 10000.0, 0) / 10000.0 + 0.0 AS norm
         FROM p JOIN t ON p.vec_id = t.vec_id ORDER BY p.vec_id""",

    "fn_explode" ->
      """SELECT e.vec_id, r.i - 1 AS pos, CAST(e.embedding[r.i] AS DOUBLE) AS comp
         FROM embeddings e, range(1, 9) r(i)
         ORDER BY vec_id, pos""",

    "fn_map" ->
      """SELECT event_id,
            'k' AS mk,
            json_extract_string(props, '$.k') AS mv,
            json_extract_string(props, '$.k')::INT AS el,
            'b' AS fk
         FROM events ORDER BY event_id""",

    "fn_json" ->
      """SELECT event_id,
            json_extract_string(props, '$.k') AS k_str,
            json_extract_string(props, '$.k')::INT AS k_int,
            CASE WHEN json_extract_string(props, '$.k') IS NULL THEN '{}'
                 ELSE '{"k":' || json_extract_string(props, '$.k') || '}'
            END AS rebuilt
         FROM events ORDER BY event_id""",

    // mirror of fn_url: regexp extraction over the same assembled URL
    "fn_url" ->
      """WITH u AS (SELECT doc_id,
              'https://data.example.com/' || source || '/doc-' || doc_id
                || '?lang=' || lang || '&v=2' AS url
            FROM documents)
         SELECT doc_id, url,
            regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
            regexp_extract(url, '^[a-z]+://[^/]+([^?]*)', 1) AS path,
            regexp_extract(url, '[?&]lang=([^&]*)', 1) AS q_lang
         FROM u ORDER BY doc_id""",

    "fn_try_cast" ->
      """WITH s AS (SELECT event_type,
                           CASE WHEN event_id % 3 = 0
                                THEN 'u' || CAST(user_id AS VARCHAR)
                                ELSE CAST(user_id AS VARCHAR) END AS sv
                    FROM events),
         p AS (SELECT event_type, TRY_CAST(sv AS BIGINT) AS parsed FROM s)
         SELECT event_type, count(parsed) AS n_parsed,
                count(*) FILTER (parsed IS NULL) AS n_rejected,
                CAST(SUM(parsed) AS BIGINT) AS sum_parsed
         FROM p GROUP BY 1 ORDER BY 1""",

    "fn_hash" ->
      """SELECT p_partkey, md5(p_name) AS m5, sha256(p_name) AS s2
         FROM part ORDER BY p_partkey""",

    "udf_scalar" ->
      """SELECT p_partkey, p_name || '%' AS pat FROM part ORDER BY p_partkey""",

    "fn_conditional" ->
      """SELECT l_orderkey, l_linenumber,
            CASE WHEN l_discount < 0.03 THEN 'low'
                 WHEN l_discount < 0.07 THEN 'mid' ELSE 'high' END AS band,
            coalesce(nullif(l_returnflag, 'N'), 'none') AS co,
            CAST(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS BIGINT) AS iv
         FROM lineitem ORDER BY l_orderkey, l_linenumber, band, co, iv"""
  )
}
