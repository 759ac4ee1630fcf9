package graft.rel

import graft.core.Tables
import graft.tsdb.{TagFilterSpec, TagFilters, TimeParse}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.A scans/ingest + §2.B projections/filters/tag-filter types.
  * Ingest parsing (OpenTSDB JSON put payload / telnet put lines) is
  * expressed as Column expressions so Catalyst codegens it — no UDFs.
  */
object ScanFilter {
  type Q = (SparkSession, String) => DataFrame

  // pinned relative-time constant (D5): "72h-ago" at NOW=2024-01-31T00:00:00Z
  private val Rel72h: Long = TimeParse.toAbsMs("72h-ago", Tables.NowMs)
  private val Day5: Long = 1704067200000L + 5L * 86400000L  // 2024-01-06
  private val Day6: Long = Day5 + 86400000L

  /** Telnet `put <metric> <ts> <value> k=v` round-trip: build the wire line
    * from events, then parse it back with regexp_extract (lib/telnet
    * analog). Integer value (event_id) avoids float-formatting skew. */
  private val TelnetRe = "^put (\\S+) (\\d+) (\\d+) user=(\\d+)$"

  /** Scratch dir for the format round-trip queries. Stable per format —
    * the writes below use mode("overwrite"), so repeated Bench/Verify
    * runs reuse (not accumulate) the scratch copy; a fresh
    * createTempDirectory per call leaked a full table copy per run. The
    * write itself is part of the measured operator, like any sink. */
  private def roundtripDir(fmt: String): String = {
    val d = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_rt", fmt)
    java.nio.file.Files.createDirectories(d)
    d.toString
  }

  val queries: Map[String, Q] = graft.core.Reg.uniqueMap(
    "scan_parquet" -> ((s, dir) =>
      Tables.lineitem(s, dir).orderBy("l_orderkey", "l_linenumber",
        "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")),

    "scan_pruned" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
               col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")),

    // metadata-only aggregate: COUNT/MIN/MAX answered from parquet
    // row-group statistics via DSv2 aggregate pushdown — at 100 TB the
    // difference between reading footers and reading rows. The v2
    // reader + pushdown confs are scoped: the 1-row plan is EXECUTED
    // here (collecting one row is the operator's point — no row data
    // exists to distribute) and both confs restored before returning,
    // so no other registered query ever plans under them. PlanSpec
    // pins `PushedAggregation` in the scan.
    "scan_agg_pushdown" -> ((s, dir) => {
      val kAgg = "spark.sql.parquet.aggregatePushdown"
      val kV1 = "spark.sql.sources.useV1SourceList"
      val saved = (s.conf.get(kAgg, "false"), s.conf.get(kV1))
      s.conf.set(kAgg, "true"); s.conf.set(kV1, "")
      try {
        val agg = s.read.parquet(s"$dir/lineitem.parquet")
          .agg(count(lit(1)).as("n_rows"),
            min(col("l_orderkey")).as("min_okey"),
            max(col("l_orderkey")).as("max_okey"))
        s.createDataFrame(java.util.Arrays.asList(agg.collect(): _*), agg.schema)
      } finally { s.conf.set(kAgg, saved._1); s.conf.set(kV1, saved._2) }
    }),

    "ingest_jsonlines" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          from_json(col("props"), org.apache.spark.sql.types.DataType.fromDDL("k INT")).getField("k").as("k"))
        .orderBy("event_id")),

    "ingest_telnet_line" -> ((s, dir) => {
      val line = concat_ws(" ", lit("put"), col("event_type"),
        col("ts_sec"), col("event_id"), concat(lit("user="), col("user_id")))
      Tables.events(s, dir).select(line.as("line"))
        .select(
          regexp_extract(col("line"), TelnetRe, 1).as("metric"),
          regexp_extract(col("line"), TelnetRe, 2).cast("long").as("ts_sec"),
          regexp_extract(col("line"), TelnetRe, 3).cast("long").as("val"),
          regexp_extract(col("line"), TelnetRe, 4).cast("long").as("user"))
        .orderBy("val")
    }),

    // CSV source+sink fidelity: write the table as CSV WITH a derived
    // CSV-hostile column (embedded commas and quotes — the writer must
    // quote, the reader must unquote), read it back with an explicit DDL
    // schema (header on; schema inference is an extra pass at scale and
    // is never used here), and hash-compare against the oracle computed
    // straight from parquet. Doubles round-trip exactly (Java shortest
    // decimal rendering parses back to the same bits).
    // table profiling (the catalog/data-ops DESCRIBE): per measure
    // column — rows, nulls, exact distinct, min/max — as rows of ONE
    // result. Each column's stats are one partial→final aggregate over
    // the same scan; at 100 TB the swap is approx_count_distinct for
    // the cardinality column (documented; exact here for the oracle).
    "scan_profile" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      def prof(c: String) = li.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1).otherwise(0)).as("n_null"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("double").as("min_val"),
        max(col(c)).cast("double").as("max_val"))
        .select(lit(c).as("column_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_val"), col("max_val"))
      prof("l_quantity").unionAll(prof("l_extendedprice"))
        .unionAll(prof("l_discount")).unionAll(prof("l_partkey"))
        .orderBy("column_name")
    }),

    // schema evolution across file generations — the ingest reality
    // every long-lived dataset hits: generation 1 has the original
    // columns, generation 2 drops one and adds another; a mergeSchema
    // read serves the UNION schema with nulls where a generation lacks
    // the column (per-file footer merge at planning, no rewrite of old
    // data). The per-generation aggregate proves both directions of
    // the union; the oracle mirrors the construction analytically.
    "ingest_schema_evolution" -> ((s, dir) => {
      val out = roundtripDir("schemaevo")
      val c = Tables.customer(s, dir)
      c.select("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
        .write.mode("overwrite").parquet(s"$out/gen=1")
      c.select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          pmod(col("c_custkey"), lit(3)).cast("int").as("loyalty_tier"))
        .write.mode("overwrite").parquet(s"$out/gen=2")
      s.read.option("mergeSchema", "true").parquet(out)
        .groupBy("gen")
        .agg(count(lit(1)).as("n_rows"),
          count(col("c_mktsegment")).as("n_mktsegment"),
          count(col("loyalty_tier")).as("n_tier"),
          sum(col("loyalty_tier")).as("sum_tier"))
        .orderBy("gen")
    }),

    "ingest_csv_roundtrip" -> ((s, dir) => {
      val out = roundtripDir("csv")
      Tables.part(s, dir)
        .select(col("p_partkey"),
          concat(col("p_name"), lit(", \""), col("p_brand"), lit("\"")).as("name_csv"),
          col("p_size"), col("p_retailprice"))
        .write.mode("overwrite").option("header", "true").csv(out)
      s.read.schema("p_partkey BIGINT, name_csv STRING, p_size INT, p_retailprice DOUBLE")
        .option("header", "true").csv(out)
        .orderBy("p_partkey")
    }),

    // ORC source+sink fidelity, timestamps included (instants must
    // survive the round-trip bit-exactly; ORC is the columnar alternate
    // interchange format, with the same pushdown/pruning properties as
    // parquet on the read side).
    "ingest_orc_roundtrip" -> ((s, dir) => {
      val out = roundtripDir("orc")
      Tables.orders(s, dir)
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
        .write.mode("overwrite").orc(out)
      s.read.orc(out).orderBy("o_orderkey")
    }),

    // Partitioned sink + pruned read-back: write documents partitioned
    // by lang — THE directory-level layout tool at corpus scale
    // (partition pruning = language/tenant routing; a lang='en' read
    // touches only that subdirectory) — then read back one partition.
    // PlanSpec asserts the read-back scan carries a PartitionFilter and
    // scans a single partition, not the full directory. Explicit select
    // restores column order (read-back appends partition cols last).
    "sink_partitioned_roundtrip" -> ((s, dir) => {
      val out = roundtripDir("part_lang")
      Tables.documents(s, dir)
        .select("doc_id", "lang", "source", "n_chars")
        .write.mode("overwrite").partitionBy("lang").parquet(out)
      s.read.parquet(out).where(col("lang") === "en")
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    }),

    // Backfill by DYNAMIC partition overwrite — the selective-rewrite
    // technique a 100 TB partitioned table depends on: the corrected
    // batch rewrites ONLY the partitions it contains (here: purchase),
    // every other partition's files are untouched. Base load + backfill
    // + read-back verification in one query; the conf is scoped and
    // restored. The read-back aggregate proves the merge semantics:
    // purchase rows carry the corrected (doubled) values, all other
    // types the originals — exactly what the oracle recomputes from
    // the source table.
    "sink_dynamic_overwrite" -> ((s, dir) => {
      val out = roundtripDir("dyn_overwrite")
      val e = Tables.events(s, dir)
        .select("event_id", "event_type", "value")
      e.write.mode("overwrite").partitionBy("event_type").parquet(out)
      val prev = s.conf.get("spark.sql.sources.partitionOverwriteMode")
      s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try e.where(col("event_type") === "purchase")
        .withColumn("value", col("value") * 2)
        .write.mode("overwrite").partitionBy("event_type").parquet(out)
      finally s.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
      s.read.parquet(out)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          graft.core.D.r4s(sum(graft.core.D.dec(col("value"))).cast("double"))
            .as("sum_value"))
        .orderBy("event_type")
    }),

    "project_select" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net"))
        .orderBy("l_orderkey", "l_linenumber", "net")),

    "filter_predicate" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .where(col("l_quantity") < 24 && col("l_discount").between(0.05, 0.07))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount")),

    "filter_time_range" -> ((s, dir) =>
      Tables.events(s, dir)
        .where(col("ts_ms") >= Day5 && col("ts_ms") < Day6)
        .select("event_id", "ts_ms", "event_type")
        .orderBy("event_id")),

    "filter_time_relative" -> ((s, dir) =>
      Tables.events(s, dir)
        .where(col("ts_ms") >= Rel72h)
        .select("event_id", "ts_ms", "user_id")
        .orderBy("event_id")),

    "tagfilter_literal_or" -> ((s, dir) =>
      Tables.events(s, dir)
        .where(TagFilters.toPredicate(col("event_type"),
          TagFilterSpec("literal_or", "event_type", "click|view")))
        .select("event_id", "event_type").orderBy("event_id")),

    "tagfilter_not_literal_or" -> ((s, dir) =>
      Tables.events(s, dir)
        .where(TagFilters.toPredicate(col("event_type"),
          TagFilterSpec("not_literal_or", "event_type", "click|view|error")))
        .select("event_id", "event_type").orderBy("event_id")),

    "tagfilter_wildcard" -> ((s, dir) =>
      Tables.part(s, dir)
        .where(TagFilters.toPredicate(col("p_type"),
          TagFilterSpec("wildcard", "p_type", "S*L")))
        .select("p_partkey", "p_type").orderBy("p_partkey")),

    "tagfilter_iwildcard" -> ((s, dir) =>
      Tables.part(s, dir)
        .where(TagFilters.toPredicate(col("p_type"),
          TagFilterSpec("iwildcard", "p_type", "eco*")))
        .select("p_partkey", "p_type").orderBy("p_partkey")),

    "tagfilter_regexp" -> ((s, dir) =>
      Tables.part(s, dir)
        .where(TagFilters.toPredicate(col("p_name"),
          TagFilterSpec("regexp", "p_name", "^(red|blue) .*t$")))
        .select("p_partkey", "p_name").orderBy("p_partkey")),

    "tagfilter_on_map" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("tags", from_json(col("props"), org.apache.spark.sql.types.DataType.fromDDL("MAP<STRING,INT>")))
        .where(element_at(col("tags"), "k") > 50)
        .select(col("event_id"), element_at(col("tags"), "k").as("k"))
        .orderBy("event_id")),

    // case-insensitive literal list (OpenTSDB iliteral_or)
    "tagfilter_iliteral_or" -> ((s, dir) =>
      Tables.events(s, dir)
        .where(TagFilters.toPredicate(col("event_type"),
          TagFilterSpec("iliteral_or", "event_type", "CLICK|View")))
        .select("event_id", "event_type").orderBy("event_id")),

    "tagfilter_not_iliteral_or" -> ((s, dir) =>
      Tables.events(s, dir)
        .where(TagFilters.toPredicate(col("event_type"),
          TagFilterSpec("not_iliteral_or", "event_type", "CLICK|View|ERROR")))
        .select("event_id", "event_type").orderBy("event_id")),

    // (?i)-prefixed pattern — identical string on both engines
    "tagfilter_regexp_ci" -> ((s, dir) =>
      Tables.part(s, dir)
        .where(TagFilters.toPredicate(col("p_name"),
          TagFilterSpec("regexp_ci", "p_name", "^(RED|Blue) .*T$")))
        .select("p_partkey", "p_name").orderBy("p_partkey")),

    // OpenTSDB explicitTags: the point's tag KEY SET is exactly the
    // queried set (no extra tags). Tags synthesized as in
    // tsdb_ttl_override: points with props.k in 1..10 carry a second
    // `ttl` key and must NOT match explicit {ksid}.
    "tagfilter_explicit" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("k", from_json(col("props"),
          org.apache.spark.sql.types.DataType.fromDDL("k INT")).getField("k"))
        .withColumn("tags",
          when(col("k").between(1, 10),
            map(lit("ksid"), lit("k0"), lit("ttl"), col("k").cast("string")))
            .otherwise(map(lit("ksid"), lit("k0"))))
        .where(graft.tsdb.TagFilters.explicitTags(col("tags"), Seq("ksid")))
        .select("event_id", "k").orderBy("event_id"))
  )

  val oracleSql: Map[String, String] = graft.core.Reg.uniqueMap(
    "scan_agg_pushdown" ->
      """SELECT count(*) AS n_rows, min(l_orderkey) AS min_okey,
                max(l_orderkey) AS max_okey
         FROM lineitem""",
    "scan_parquet" ->
      """SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey,
         l_suppkey, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate""",

    "scan_pruned" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
         ORDER BY l_orderkey, l_linenumber, l_quantity""",

    "ingest_jsonlines" ->
      """SELECT event_id, json_extract_string(props, '$.k')::INT AS k
         FROM events ORDER BY event_id""",

    "ingest_telnet_line" ->
      """WITH lines AS (
           SELECT 'put ' || event_type || ' ' || (epoch_ns(ts) // 1000000000)
                  || ' ' || event_id || ' user=' || user_id AS line
           FROM events)
         SELECT regexp_extract(line, 'put (\S+) (\d+) (\d+) user=(\d+)', 1) AS metric,
                regexp_extract(line, 'put (\S+) (\d+) (\d+) user=(\d+)', 2)::BIGINT AS ts_sec,
                regexp_extract(line, 'put (\S+) (\d+) (\d+) user=(\d+)', 3)::BIGINT AS val,
                regexp_extract(line, 'put (\S+) (\d+) (\d+) user=(\d+)', 4)::BIGINT AS user
         FROM lines ORDER BY val""",

    "scan_profile" -> {
      val prof = (c: String) =>
        s"""SELECT '$c' AS column_name, count(*) AS n_rows,
              CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
              count(DISTINCT $c) AS n_distinct,
              CAST(min($c) AS DOUBLE) AS min_val,
              CAST(max($c) AS DOUBLE) AS max_val
            FROM lineitem"""
      s"""SELECT * FROM (${prof("l_quantity")}
          UNION ALL ${prof("l_extendedprice")}
          UNION ALL ${prof("l_discount")}
          UNION ALL ${prof("l_partkey")})
          ORDER BY column_name"""
    },

    // mirror of ingest_schema_evolution: the construction restated
    // analytically (gen 1 lacks loyalty_tier, gen 2 lacks mktsegment)
    "ingest_schema_evolution" ->
      """SELECT 1 AS gen, count(*) AS n_rows, count(*) AS n_mktsegment,
                CAST(0 AS BIGINT) AS n_tier, CAST(NULL AS BIGINT) AS sum_tier
         FROM customer
         UNION ALL
         SELECT 2, count(*), CAST(0 AS BIGINT), count(*),
                CAST(SUM(c_custkey % 3) AS BIGINT)
         FROM customer
         ORDER BY gen""",

    "ingest_csv_roundtrip" ->
      """SELECT p_partkey, p_name || ', "' || p_brand || '"' AS name_csv,
            p_size, p_retailprice
         FROM part ORDER BY p_partkey""",

    "ingest_orc_roundtrip" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
         FROM orders ORDER BY o_orderkey""",

    "sink_partitioned_roundtrip" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
         WHERE lang = 'en' ORDER BY doc_id""",

    // mirror of sink_dynamic_overwrite: the post-backfill table state
    // recomputed from the source — purchase values doubled, the rest
    // untouched
    "sink_dynamic_overwrite" ->
      s"""SELECT event_type, count(*) AS n,
            ${graft.core.D.oR4(graft.core.D.oSumDec(
              "CASE WHEN event_type = 'purchase' THEN value * 2 ELSE value END"))}
              AS sum_value
          FROM events GROUP BY 1 ORDER BY 1""",

    "project_select" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice * (1.0 - l_discount) AS net
         FROM lineitem ORDER BY l_orderkey, l_linenumber, net""",

    "filter_predicate" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
         WHERE l_quantity < 24 AND l_discount BETWEEN 0.05 AND 0.07
         ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount""",

    "filter_time_range" ->
      s"""SELECT event_id, epoch_ns(ts) // 1000000 AS ts_ms, event_type FROM events
          WHERE epoch_ns(ts) // 1000000 >= $Day5 AND epoch_ns(ts) // 1000000 < $Day6
          ORDER BY event_id""",

    "filter_time_relative" ->
      s"""SELECT event_id, epoch_ns(ts) // 1000000 AS ts_ms, user_id FROM events
          WHERE epoch_ns(ts) // 1000000 >= $Rel72h ORDER BY event_id""",

    "tagfilter_literal_or" ->
      """SELECT event_id, event_type FROM events
         WHERE event_type IN ('click', 'view') ORDER BY event_id""",

    "tagfilter_not_literal_or" ->
      """SELECT event_id, event_type FROM events
         WHERE COALESCE(event_type NOT IN ('click', 'view', 'error'), TRUE)
         ORDER BY event_id""",

    "tagfilter_wildcard" ->
      "SELECT p_partkey, p_type FROM part WHERE p_type LIKE 'S%L' ORDER BY p_partkey",

    "tagfilter_iwildcard" ->
      """SELECT p_partkey, p_type FROM part
         WHERE lower(p_type) LIKE 'eco%' ORDER BY p_partkey""",

    "tagfilter_regexp" ->
      """SELECT p_partkey, p_name FROM part
         WHERE regexp_matches(p_name, '^(red|blue) .*t$') ORDER BY p_partkey""",

    "tagfilter_on_map" ->
      """SELECT event_id, json_extract_string(props, '$.k')::INT AS k FROM events
         WHERE json_extract_string(props, '$.k')::INT > 50 ORDER BY event_id""",

    "tagfilter_iliteral_or" ->
      """SELECT event_id, event_type FROM events
         WHERE lower(event_type) IN ('click', 'view') ORDER BY event_id""",

    "tagfilter_not_iliteral_or" ->
      """SELECT event_id, event_type FROM events
         WHERE COALESCE(lower(event_type) NOT IN ('click', 'view', 'error'), TRUE)
         ORDER BY event_id""",

    "tagfilter_regexp_ci" ->
      """SELECT p_partkey, p_name FROM part
         WHERE regexp_matches(p_name, '(?i)^(RED|Blue) .*T$') ORDER BY p_partkey""",

    // explicit {ksid} ⟺ no ttl tag was attached ⟺ k outside 1..10
    "tagfilter_explicit" ->
      """SELECT event_id, json_extract_string(props, '$.k')::INT AS k FROM events
         WHERE COALESCE(json_extract_string(props, '$.k')::INT NOT BETWEEN 1 AND 10, TRUE)
         ORDER BY event_id"""
  )
}
