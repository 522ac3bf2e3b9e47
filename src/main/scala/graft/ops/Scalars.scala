package graft.ops

import org.apache.spark.sql.functions._

/** §2.7 Scalar functions: string / date / math / array / map / json. All
  * built-ins (codegen'd) — no UDFs anywhere in this module. Derived integer
  * outputs are cast to BIGINT on both sides (DuckDB's ceil/sign/isodow
  * return DOUBLE/TINYINT/BIGINT; Spark's ceil/signum/weekday differ) so the
  * output schemas align exactly.
  */
object Scalars {

  val strFuncs = Op(
    "str_funcs",
    (s, d) =>
      T.part(s, d)
        .select(
          col("p_partkey"),
          lower(col("p_name")).as("lo"),
          upper(col("p_name")).as("up"),
          length(col("p_name")).cast("long").as("len"),
          substring(col("p_name"), 1, 5).as("pre5"),
          concat_ws("|", col("p_brand"), col("p_type")).as("bt"),
          lpad(col("p_name"), 30, ".").as("padded"),
          trim(lit("  x  ")).as("trimmed"))
        .orderBy(col("p_partkey")),
    Some("""
      SELECT p_partkey,
             lower(p_name) AS lo,
             upper(p_name) AS up,
             CAST(length(p_name) AS BIGINT) AS len,
             substring(p_name, 1, 5) AS pre5,
             concat_ws('|', p_brand, p_type) AS bt,
             lpad(p_name, 30, '.') AS padded,
             trim('  x  ') AS trimmed
      FROM part ORDER BY p_partkey
    """)
  )

  /** Note the dialect trap: DuckDB regexp_replace is first-match unless the
    * 'g' flag is passed; Spark replaces all occurrences.
    */
  val strSplitRegex = Op(
    "str_split_regex",
    (s, d) =>
      T.part(s, d)
        .select(
          col("p_partkey"),
          size(split(col("p_type"), " ")).cast("long").as("n_type_words"),
          regexp_extract(col("p_name"), "([0-9]+)", 1).as("digits"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"))
        .orderBy(col("p_partkey")),
    Some("""
      SELECT p_partkey,
             CAST(len(string_split(p_type, ' ')) AS BIGINT) AS n_type_words,
             regexp_extract(p_name, '([0-9]+)', 1) AS digits,
             regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
      FROM part ORDER BY p_partkey
    """)
  )

  /** Day-of-week normalized to ISO (1=Mon..7=Sun) on both sides: Spark
    * weekday()+1 == DuckDB isodow(). date_trunc emitted as DATE (Spark
    * trunc(); DuckDB date_trunc on timestamp already yields DATE).
    */
  val dtFuncs = Op(
    "dt_funcs",
    (s, d) =>
      T.orders(s, d)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"),
          (weekday(col("o_orderdate")) + 1).cast("long").as("iso_dow"),
          trunc(col("o_orderdate"), "month").as("month_start"),
          datediff(col("o_orderdate"), to_date(lit("1995-01-01"))).cast("long").as("days_since"),
          add_months(col("o_orderdate"), 3).as("plus3m"))
        .orderBy(col("o_orderkey")),
    Some("""
      SELECT o_orderkey,
             CAST(year(o_orderdate) AS BIGINT) AS yr,
             CAST(month(o_orderdate) AS BIGINT) AS mo,
             isodow(o_orderdate) AS iso_dow,
             date_trunc('month', o_orderdate) AS month_start,
             date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
             CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m
      FROM orders ORDER BY o_orderkey
    """)
  )

  /** 15-minute epoch buckets by integer division (floor — all epochs
    * positive).
    */
  val dtEpochWindow = Op(
    "dt_epoch_window",
    (s, d) =>
      T.events(s, d)
        .withColumn("bucket", expr("unix_timestamp(ts) div 900"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_events"), Det.sumDec(col("value")).as("sum_value"))
        .orderBy(col("bucket")),
    Some("""
      SELECT CAST(FLOOR(EXTRACT(EPOCH FROM ts)) AS BIGINT) // 900 AS bucket,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1 ORDER BY 1
    """)
  )

  /** libm functions round6'd at the outermost layer (JVM vs C++ math libs
    * can differ in the last ulp; 6dp is far above that noise).
    */
  val mathFuncs = Op(
    "math_funcs",
    (s, d) =>
      T.orders(s, d)
        .select(
          col("o_orderkey"),
          round(col("o_totalprice"), 1).as("r1"),
          abs(-col("o_totalprice")).as("absv"),
          ceil(col("o_totalprice")).cast("long").as("ceilv"),
          floor(col("o_totalprice")).cast("long").as("floorv"),
          round(log(col("o_totalprice")), 6).as("lnv"),
          round(log10(col("o_totalprice")), 6).as("log10v"),
          round(pow(col("o_totalprice"), lit(0.5)), 6).as("powhalf"),
          round(sqrt(col("o_totalprice")), 6).as("sqrtv"),
          signum(col("o_totalprice") - 100000.0).cast("long").as("signv"))
        .orderBy(col("o_orderkey")),
    Some("""
      SELECT o_orderkey,
             ROUND(o_totalprice, 1) AS r1,
             ABS(-o_totalprice) AS absv,
             CAST(CEIL(o_totalprice) AS BIGINT) AS ceilv,
             CAST(FLOOR(o_totalprice) AS BIGINT) AS floorv,
             ROUND(LN(o_totalprice), 6) AS lnv,
             ROUND(LOG10(o_totalprice), 6) AS log10v,
             ROUND(POW(o_totalprice, 0.5), 6) AS powhalf,
             ROUND(SQRT(o_totalprice), 6) AS sqrtv,
             CAST(SIGN(o_totalprice - 100000.0) AS BIGINT) AS signv
      FROM orders ORDER BY o_orderkey
    """)
  )

  /** Binary codecs: base64/hex of UTF-8 bytes plus a full
    * encode→base64→unbase64→decode round-trip — the string⇄binary bridge
    * multimodal payload columns rely on.
    */
  val strCodecs = Op(
    "str_codecs",
    (s, d) =>
      T.part(s, d)
        .filter(col("p_partkey") <= 200)
        .select(
          col("p_partkey"),
          base64(encode(col("p_name"), "UTF-8")).as("b64"),
          hex(encode(col("p_name"), "UTF-8")).as("hx"),
          decode(unbase64(base64(encode(col("p_name"), "UTF-8"))), "UTF-8").as("roundtrip"))
        .orderBy(col("p_partkey")),
    Some("""
      SELECT p_partkey,
             base64(encode(p_name)) AS b64,
             hex(encode(p_name)) AS hx,
             p_name AS roundtrip
      FROM part WHERE p_partkey <= 200 ORDER BY p_partkey
    """)
  )

  /** Token rows via posexplode (Generate) — pos makes the order total.
    * DuckDB twin uses a lateral range() join (WITH ORDINALITY is not in
    * DuckDB 1.0).
    */
  val arrExplodeTokens = Op(
    "arr_explode_tokens",
    (s, d) =>
      T.documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), posexplode(split(lower(col("text")), " ")).as(Seq("pos", "token")))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"), col("token"))
        .orderBy(col("doc_id"), col("pos")),
    Some("""
      SELECT doc_id, generate_subscripts(arr, 1) AS pos, unnest(arr) AS token
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS arr
            FROM documents WHERE doc_id < 100)
      ORDER BY doc_id, pos
    """)
  )

  /** first3_sorted is array_join'd to a scalar string because the driver's
    * comparator cannot hash array-typed cells (r1 FAIL was a comparator
    * crash, not a value mismatch); sort_array/slice/array_distinct are still
    * exercised upstream of the join.
    */
  val arrFuncs = Op(
    "arr_funcs",
    (s, d) =>
      T.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .select(
          col("doc_id"),
          size(col("toks")).cast("long").as("n_tokens"),
          array_contains(col("toks"), "spark").as("has_spark"),
          array_join(slice(sort_array(col("toks")), 1, 3), ",").as("first3_sorted"),
          size(array_distinct(col("toks"))).cast("long").as("n_distinct"))
        .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             list_contains(string_split(text, ' '), 'spark') AS has_spark,
             array_to_string(list_sort(string_split(text, ' '))[1:3], ',') AS first3_sorted,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct
      FROM documents ORDER BY doc_id
    """)
  )

  /** explode_outer null preservation: rows with EMPTY arrays survive as a
    * single null-token row (plain explode silently drops them — the
    * classic lost-rows bug in token pipelines). Empty arrays are injected
    * deterministically (every doc_id % 5 == 0) so the oracle reconstructs
    * both branches.
    */
  val arrExplodeOuter = Op(
    "arr_explode_outer",
    (s, d) =>
      T.documents(s, d)
        .filter(col("doc_id") < 50)
        .withColumn("arr",
          when(col("doc_id") % 5 === 0, array().cast("array<string>"))
            .otherwise(slice(split(col("text"), " "), 1, 3)))
        .select(col("doc_id"), explode_outer(col("arr")).as("token"))
        .orderBy(col("doc_id"), col("token").asc_nulls_first),
    Some("""
      WITH t AS (SELECT doc_id,
                        CASE WHEN doc_id % 5 = 0 THEN []
                             ELSE string_split(text, ' ')[1:3] END AS arr
                 FROM documents WHERE doc_id < 50)
      SELECT doc_id, unnest(arr) AS token FROM t WHERE len(arr) > 0
      UNION ALL
      SELECT doc_id, NULL FROM t WHERE len(arr) = 0
      ORDER BY doc_id, token NULLS FIRST
    """)
  )

  /** Higher-order lambdas over the embedding vector: transform + filter +
    * aggregate (fold). Element-wise float→double cast is applied identically
    * on both sides before any arithmetic (SURVEY §7.3-3).
    */
  val arrHigherOrder = Op(
    "arr_higher_order",
    (s, d) =>
      T.embeddings(s, d)
        .select(
          col("vec_id"),
          round(
            aggregate(
              transform(slice(col("embedding"), 1, 8), x => x.cast("double") * x.cast("double")),
              lit(0.0),
              (acc, x) => acc + x),
            6).as("sumsq8"),
          size(filter(col("embedding"), x => x > 0f)).cast("long").as("n_pos"))
        .orderBy(col("vec_id")),
    Some("""
      SELECT vec_id,
             ROUND(list_sum(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS sumsq8,
             CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos
      FROM embeddings ORDER BY vec_id
    """)
  )

  /** Map built per user from sorted entries, then exploded back to rows
    * (maps never hash-compared directly — Appendix A-6). n_keys proves the
    * map_keys/size surface.
    */
  val mapFuncs = Op(
    "map_funcs",
    (s, d) => {
      val cnts = T.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      cnts
        .groupBy(col("user_id"))
        .agg(map_from_entries(array_sort(collect_list(struct(col("event_type"), col("cnt"))))).as("m"))
        .select(col("user_id"), size(map_keys(col("m"))).cast("long").as("n_keys"), explode(col("m")).as(Seq("key", "value")))
        .orderBy(col("user_id"), col("key"))
    },
    Some("""
      SELECT user_id,
             COUNT(*) OVER (PARTITION BY user_id) AS n_keys,
             event_type AS key,
             COUNT(*) AS value
      FROM events GROUP BY user_id, event_type
      ORDER BY user_id, key
    """)
  )

  /** JSON extraction + integer stats (integer sums are exact — no decimal
    * machinery needed; DuckDB integer SUM is HUGEINT, cast back to BIGINT).
    */
  val jsonExtract = Op(
    "json_extract",
    (s, d) =>
      T.events(s, d)
        .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .orderBy(col("event_type")),
    Some("""
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(k) AS BIGINT) AS sum_k,
             MIN(k) AS min_k,
             MAX(k) AS max_k
      FROM (SELECT event_type, CAST(props->>'$.k' AS BIGINT) AS k FROM events)
      GROUP BY event_type ORDER BY event_type
    """)
  )

  /** Gap-filled time series: daily purchase counts over a generated date
    * spine, missing days explicit as 0 — the densification step every
    * downstream time-series model needs (a LEFT JOIN against a `sequence`
    * spine; the spine derives from the data's own bounds so the op is
    * closed over its input). The spine is tiny (one row per day) and
    * one side of the join; the fact side aggregates BEFORE the join, so
    * the join touches |days| rows, not |events|. The broadcast hint sits
    * on the DAILY (right/build) side — a left-outer join can only
    * build-broadcast its non-preserved side, so hinting the spine would
    * be silently dead.
    */
  val dtGapFillSpine = Op(
    "dt_gap_fill_spine",
    (s, d) => {
      val p = T.events(s, d).filter(col("event_type") === "purchase")
        .select(to_date(col("ts")).as("day"))
      val daily = p.groupBy(col("day")).agg(count(lit(1)).as("n"))
      val spine = p.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
      spine.join(broadcast(daily), Seq("day"), "left")
        .select(col("day"), coalesce(col("n"), lit(0L)).as("n_purchases"))
        .orderBy(col("day"))
    },
    Some("""
      WITH p AS (
        SELECT CAST(ts AS DATE) AS day FROM events
        WHERE event_type = 'purchase'),
      daily AS (SELECT day, COUNT(*) AS n FROM p GROUP BY day),
      b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM p),
      spine AS (
        SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
                                           CAST(hi AS TIMESTAMP),
                                           INTERVAL 1 DAY)) AS DATE) AS day
        FROM b)
      SELECT s.day, COALESCE(n, 0) AS n_purchases
      FROM spine s LEFT JOIN daily USING (day)
      ORDER BY day
    """)
  )

  /** Month-over-month revenue growth per nation (r3c) — the
    * period-over-period report every BI layer ships: monthly decimal-exact
    * revenue, lag(1) over the per-nation month series, growth in integer
    * ppm ((cur - prev) * 1e6 div prev on the EXACT 1e-4 revenue units —
    * float division would be engine-identical here, but ppm keeps the
    * whole op integer and makes the NULL first month explicit). Scale
    * shape: the monthly rollup is the only data-sized shuffle; the lag
    * window runs over nations × months rows.
    */
  /** The widened growth-ppm expression of [[dtMomGrowth]], extracted so
    * PropertySpec can drive it past Long range on synthetic data (abs diff
    * ~1.2e13 units × 1e6 > 2^63): a regression back to the unwidened BIGINT
    * multiply fails `sbt test` with the same ARITHMETIC_OVERFLOW the sf10
    * sweep caught, not the next scale sweep.
    */
  private[graft] val growthPpmExpr =
    """CAST(SIGN(rev_units - prev_units) AS BIGINT)
       * CAST((CAST(abs(rev_units - prev_units) AS DECIMAL(38,0))
               * 1000000) div prev_units AS BIGINT)"""

  val dtMomGrowth = Op(
    "dt_mom_growth",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val monthly = T.orders(s, d)
        .join(T.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(T.nation(s, d).select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), date_trunc("month", col("o_orderdate")).as("month"))
        .agg(expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) * 10000 AS BIGINT)")
          .as("rev_units"))
      val w = Window.partitionBy(col("n_name")).orderBy(col("month"))
      monthly
        .withColumn("prev_units", lag(col("rev_units"), 1).over(w))
        // sign * (abs * 1e6 div prev): Spark's `div` truncates toward zero
        // while DuckDB's `//` floors — on the non-negative operand the two
        // agree, so the signed growth is engine-identical.
        // SCALE FIX (r12; caught by the sf10 ORACLE sweep): the abs-diff is
        // ~1.2e13 revenue units per nation-month at sf10, so ×1e6 overflows
        // BIGINT on BOTH engines — widen the intermediate (DECIMAL(38,0)
        // here, HUGEINT in the oracle); the floored quotient is bit-equal.
        .withColumn("growth_ppm", expr(growthPpmExpr))
        .select(col("n_name"), col("month"), col("rev_units"),
          col("prev_units"), col("growth_ppm"))
        .orderBy(col("n_name"), col("month"))
    },
    Some("""
      WITH monthly AS (
        SELECT n_name, date_trunc('month', o_orderdate) AS month,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) * 10000 AS BIGINT) AS rev_units
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name, date_trunc('month', o_orderdate)),
      lagged AS (
        SELECT n_name, month, rev_units,
               LAG(rev_units, 1) OVER (PARTITION BY n_name ORDER BY month) AS prev_units
        FROM monthly)
      SELECT n_name, month, rev_units, prev_units,
             CAST(SIGN(rev_units - prev_units) AS BIGINT)
               * CAST(CAST(abs(rev_units - prev_units) AS HUGEINT)
                      * 1000000 // prev_units AS BIGINT) AS growth_ppm
      FROM lagged
      ORDER BY n_name, month
    """)
  )

  /** Bitwise scalar surface (r7) — the primitive layer under the engine's
    * own sketch/bitmap ops (serve_bitmap_index packs with bit_or,
    * sim_hamming pairs xor + bit_count, Morton tiles shift + or): and/or/
    * xor/not, shifts, popcount, exercised per-row over the key columns and
    * rolled up so every operator's value actually matters to the hash.
    * All codegen'd builtins in Spark; DuckDB twins are the same operators
    * (xor() spelled as a function there).
    */
  val bitFuncs = Op(
    "bit_funcs",
    (s, d) =>
      T.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .select(
          expr("o & p").as("band"), expr("o | p").as("bor"),
          expr("o ^ p").as("bxor"), expr("~o").as("bnot"),
          expr("shiftleft(o, 3)").as("shl"), expr("shiftright(p, 2)").as("shr"),
          expr("bit_count(o ^ p)").as("hamming"))
        .agg(
          sum(expr("band % 65536")).as("s_and"),
          sum(expr("bor % 65536")).as("s_or"),
          sum(expr("bxor % 65536")).as("s_xor"),
          sum(expr("bnot % 65536")).as("s_not"),
          sum(expr("shl % 65536")).as("s_shl"),
          sum(expr("shr % 65536")).as("s_shr"),
          sum(col("hamming")).cast("long").as("s_hamming"),
          max(col("hamming")).cast("long").as("max_hamming")),
    Some("""
      WITH b AS (
        SELECT l_orderkey & l_partkey AS band,
               l_orderkey | l_partkey AS bor,
               xor(l_orderkey, l_partkey) AS bxor,
               ~l_orderkey AS bnot,
               l_orderkey << 3 AS shl,
               l_partkey >> 2 AS shr,
               bit_count(xor(l_orderkey, l_partkey)) AS hamming
        FROM lineitem)
      SELECT CAST(SUM(band % 65536) AS BIGINT) AS s_and,
             CAST(SUM(bor % 65536) AS BIGINT) AS s_or,
             CAST(SUM(bxor % 65536) AS BIGINT) AS s_xor,
             CAST(SUM(bnot % 65536) AS BIGINT) AS s_not,
             CAST(SUM(shl % 65536) AS BIGINT) AS s_shl,
             CAST(SUM(shr % 65536) AS BIGINT) AS s_shr,
             CAST(SUM(hamming) AS BIGINT) AS s_hamming,
             CAST(MAX(hamming) AS BIGINT) AS max_hamming
      FROM b
    """)
  )

  /** Business-day lead time (r8) — order-to-ship latency counted in
    * weekdays, the SLA arithmetic every fulfillment dashboard needs and
    * naive datediff gets wrong by ~2/7. Closed form, no calendar table:
    * with d = days since an anchor Monday (1970-01-05), the weekdays
    * before day d are f(d) = (d div 7)·5 + least(d mod 7, 5), so the
    * business days in [order, ship) are f(d_ship) − f(d_order) — pure
    * integer arithmetic on the codegen'd datediff, identical in both
    * engines (no UDF, no generate-series explode per row, which at 100 TB
    * would multiply the scan by the mean lead time). Emits the lead-time
    * histogram + per-bucket calendar-day contrast. (This fixture's ship
    * dates are generated independently of order dates, so the histogram
    * spans negative leads too — the closed form is sign-correct either
    * way: f is monotone and exact for all non-negative anchor offsets.)
    */
  val dtBusinessDays = Op(
    "dt_business_days",
    (s, d) => {
      val anchor = to_date(lit("1970-01-05")) // a Monday
      val joined = T.lineitem(s, d)
        .select(col("l_orderkey"), to_date(col("l_shipdate")).as("ship"))
        .join(T.orders(s, d)
          .select(col("o_orderkey"), to_date(col("o_orderdate")).as("ord")),
          col("l_orderkey") === col("o_orderkey"))
        .select(datediff(col("ship"), anchor).as("ds"),
          datediff(col("ord"), anchor).as("dord"))
        .select(
          (expr("(ds div 7) * 5 + least(ds % 7, 5)") -
            expr("(dord div 7) * 5 + least(dord % 7, 5)")).cast("long").as("busdays"),
          (col("ds") - col("dord")).cast("long").as("caldays"))
      joined.groupBy(col("busdays"))
        .agg(count(lit(1)).as("n_lines"),
          min(col("caldays")).as("min_caldays"),
          max(col("caldays")).as("max_caldays"))
        .orderBy(col("busdays"))
    },
    Some("""
      WITH d AS (
        SELECT date_diff('day', DATE '1970-01-05', CAST(l_shipdate AS DATE)) AS ds,
               date_diff('day', DATE '1970-01-05', CAST(o_orderdate AS DATE)) AS dord
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      b AS (
        SELECT ((ds // 7) * 5 + least(ds % 7, 5))
               - ((dord // 7) * 5 + least(dord % 7, 5)) AS busdays,
               ds - dord AS caldays
        FROM d)
      SELECT busdays, COUNT(*) AS n_lines,
             MIN(caldays) AS min_caldays, MAX(caldays) AS max_caldays
      FROM b GROUP BY busdays ORDER BY busdays
    """)
  )

  /** 4-4-5 fiscal (retail) calendar rollup (r8) — the NRF calendar every
    * retail BI stack reports on: 52-week fiscal years of four 13-week
    * quarters split 4+4+5, anchored here at Monday 1992-01-06. Entirely
    * closed-form integer arithmetic on the day offset (week = d div 7,
    * quarter = week-in-year div 13, month-in-quarter by the 4/8 split) —
    * no calendar dimension table, no UDF, both engines bit-identical.
    * (The real NRF calendar inserts a 53rd week every 5-6 years; the
    * fixed-52 form is the documented simplification — the restatement
    * logic lives in which anchor you choose, not in this arithmetic.)
    * Revenue through the decimal discipline, one scan, one rollup.
    */
  val dtFiscalCalendar = Op(
    "dt_fiscal_calendar",
    (s, d) => {
      val anchor = to_date(lit("1992-01-06")) // a Monday
      T.lineitem(s, d)
        .select(datediff(to_date(col("l_shipdate")), anchor).as("dd"),
          col("l_extendedprice"), col("l_discount"))
        .filter(col("dd") >= 0)
        .select(expr("dd div 7").as("wk"),
          col("l_extendedprice"), col("l_discount"))
        .select(expr("wk div 52").cast("long").as("fy"),
          expr("(wk % 52) div 13").cast("long").as("fq0"),
          expr("(wk % 52) % 13").cast("long").as("wq"),
          col("l_extendedprice"), col("l_discount"))
        .select(col("fy"), (col("fq0") + 1).as("fiscal_quarter"),
          (col("fq0") * 3 +
            when(col("wq") < 4, 1).when(col("wq") < 8, 2).otherwise(3))
            .as("fiscal_month"),
          col("l_extendedprice"), col("l_discount"))
        .groupBy(col("fy"), col("fiscal_quarter"), col("fiscal_month"))
        .agg(count(lit(1)).as("n_lines"),
          Det.sumDec(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"))
        .orderBy(col("fy"), col("fiscal_quarter"), col("fiscal_month"))
    },
    Some("""
      WITH base AS (
        SELECT date_diff('day', DATE '1992-01-06', CAST(l_shipdate AS DATE)) AS dd,
               l_extendedprice, l_discount
        FROM lineitem),
      wk AS (
        SELECT dd // 7 AS wk, l_extendedprice, l_discount
        FROM base WHERE dd >= 0),
      f AS (
        SELECT wk // 52 AS fy,
               (wk % 52) // 13 AS fq0,
               (wk % 52) % 13 AS wq,
               l_extendedprice, l_discount
        FROM wk)
      SELECT fy, fq0 + 1 AS fiscal_quarter,
             fq0 * 3 + CASE WHEN wq < 4 THEN 1 WHEN wq < 8 THEN 2 ELSE 3 END
               AS fiscal_month,
             COUNT(*) AS n_lines,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM f
      GROUP BY 1, 2, 3
      ORDER BY fy, fiscal_quarter, fiscal_month
    """)
  )

  val ops: Vector[Op] = Vector(
    strFuncs, strSplitRegex, strCodecs, dtFuncs, dtEpochWindow, mathFuncs,
    arrExplodeTokens, arrFuncs, arrExplodeOuter, arrHigherOrder, mapFuncs,
    jsonExtract, dtGapFillSpine, dtMomGrowth, bitFuncs, dtBusinessDays,
    dtFiscalCalendar)
}
