"""Scalar-function sweeps — SURVEY.md §2.9 (BASELINE.md bench item 5).

One projection-heavy query per function family, evaluated over lineitem /
customer / part and oracle-checked. Everything is a JVM expression inside
whole-stage codegen — the sweep doubles as a plan-quality check (a single
scan + project, filters pushed down).

DuckDB gaps handled on the ORACLE side (Spark exceeds it here): initcap and
overlay are emulated with list/substr expressions; OVERLAPS is expanded to
its comparison form on both sides.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_1_6_0_spark.functions import scalar as fx
from flink_1_6_0_spark.queries import T
from flink_1_6_0_spark.registry import query


@query(
    "scalar_string_sweep",
    oracle="""
    SELECT
      c_custkey,
      substr(c_name, 1, 8)                                   AS sub,
      substr(c_name, 1, 3) || 'XY' || substr(c_name, 6)      AS ovl,
      trim(c_mktsegment)                                     AS trimmed,
      position('0' IN c_name)                                AS pos,
      length(c_name)                                         AS clen,
      upper(c_mktsegment)                                    AS up,
      lower(c_mktsegment)                                    AS lo,
      array_to_string(list_transform(string_split(lower(replace(c_name, '#', ' ')), ' '),
                       w -> upper(w[1]) || w[2:]), ' ')      AS cap,
      c_name || '|' || c_mktsegment                          AS cat,
      concat_ws('-', c_name, c_mktsegment)                   AS catws,
      lpad(c_mktsegment, 12, '*')                            AS lp,
      rpad(c_mktsegment, 12, '*')                            AS rp,
      md5(c_name)                                            AS h_md5,
      sha256(c_name)                                         AS h_sha256,
      (c_name LIKE 'Customer%')                              AS is_cust,
      (c_mktsegment SIMILAR TO 'BU.*ING')                    AS sim
    FROM customer
    """,
    tags=("batch", "scalar"),
    bench=True,
)
def scalar_string_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUBSTRING/OVERLAY/TRIM/POSITION/CHAR_LENGTH/UPPER/LOWER/INITCAP/CONCAT/
    CONCAT_WS/LPAD/RPAD/MD5/SHA2/LIKE/SIMILAR TO (FunctionCatalog.scala:386-444).
    INITCAP input is normalized ('#'→' ') because Flink/Spark initcap treats
    any non-letter as a word boundary while the oracle emulation splits on
    spaces only."""
    c = T(spark, sf_dir, "customer")
    name, seg = F.col("c_name"), F.col("c_mktsegment")
    return c.select(
        "c_custkey",
        F.substring(name, 1, 8).alias("sub"),
        F.overlay(name, F.lit("XY"), 4, 2).alias("ovl"),
        F.trim(seg).alias("trimmed"),
        fx.position("0", name).cast("long").alias("pos"),
        F.char_length(name).cast("long").alias("clen"),
        F.upper(seg).alias("up"),
        F.lower(seg).alias("lo"),
        F.initcap(F.lower(F.replace(name, F.lit("#"), F.lit(" ")))).alias("cap"),
        F.concat(name, F.lit("|"), seg).alias("cat"),
        F.concat_ws("-", name, seg).alias("catws"),
        F.lpad(seg, 12, "*").alias("lp"),
        F.rpad(seg, 12, "*").alias("rp"),
        F.md5(name).alias("h_md5"),
        F.sha2(name, 256).alias("h_sha256"),
        name.like("Customer%").alias("is_cust"),
        fx.similar_to(seg, "BU%ING").alias("sim"),
    )


@query(
    "scalar_math_sweep",
    oracle="""
    SELECT
      l_orderkey, l_linenumber,
      abs(l_discount - 0.05)                         AS v_abs,
      sign(l_discount - 0.05)::DOUBLE                AS v_sign,
      round(power(l_quantity, 2), 6)                 AS v_pow,
      round(sqrt(l_extendedprice), 6)                AS v_sqrt,
      round(exp(l_discount), 6)                      AS v_exp,
      round(ln(l_extendedprice), 6)                  AS v_ln,
      round(log10(l_extendedprice), 6)               AS v_log10,
      round(log(2, l_quantity + 1), 6)               AS v_log2,
      floor(l_extendedprice)::BIGINT                 AS v_floor,
      ceil(l_extendedprice)::BIGINT                  AS v_ceil,
      round(l_extendedprice, 1)                      AS v_round,
      round(sin(l_discount), 6)                      AS v_sin,
      round(cos(l_discount), 6)                      AS v_cos,
      round(tan(l_discount + 0.01), 6)               AS v_tan,
      round(cot(l_discount + 0.01), 6)               AS v_cot,
      round(asin(l_discount), 6)                     AS v_asin,
      round(acos(l_discount), 6)                     AS v_acos,
      round(atan(l_discount), 6)                     AS v_atan,
      round(degrees(l_discount), 6)                  AS v_deg,
      round(radians(l_quantity), 6)                  AS v_rad,
      round(pi(), 6)                                 AS v_pi,
      mod(l_orderkey, 7)                             AS v_mod,
      l_orderkey // 7                                AS v_intdiv,
      bin(l_linenumber)                              AS v_bin
    FROM lineitem WHERE l_orderkey < 500
    """,
    tags=("batch", "scalar"),
)
def scalar_math_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABS/SIGN/POWER/SQRT/EXP/LN/LOG10/LOG(b,x)/FLOOR/CEIL/ROUND/trig/COT/
    DEGREES/RADIANS/PI/MOD/DIVIDE_INTEGER/BIN (FunctionCatalog.scala:314-436)."""
    l = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    d, q, p = F.col("l_discount"), F.col("l_quantity"), F.col("l_extendedprice")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(d - 0.05).alias("v_abs"),
        F.signum(d - 0.05).alias("v_sign"),
        F.round(F.pow(q, 2), 6).alias("v_pow"),
        F.round(F.sqrt(p), 6).alias("v_sqrt"),
        F.round(F.exp(d), 6).alias("v_exp"),
        F.round(F.log(p), 6).alias("v_ln"),
        F.round(F.log10(p), 6).alias("v_log10"),
        F.round(fx.log_base(2.0, q + 1), 6).alias("v_log2"),
        F.floor(p).alias("v_floor"),
        F.ceil(p).alias("v_ceil"),
        F.round(p, 1).alias("v_round"),
        F.round(F.sin(d), 6).alias("v_sin"),
        F.round(F.cos(d), 6).alias("v_cos"),
        F.round(F.tan(d + 0.01), 6).alias("v_tan"),
        F.round(fx.cot(d + 0.01), 6).alias("v_cot"),
        F.round(F.asin(d), 6).alias("v_asin"),
        F.round(F.acos(d), 6).alias("v_acos"),
        F.round(F.atan(d), 6).alias("v_atan"),
        F.round(F.degrees(d), 6).alias("v_deg"),
        F.round(F.radians(q), 6).alias("v_rad"),
        F.round(F.lit(3.14159265358979), 6).alias("v_pi"),
        (F.col("l_orderkey") % 7).alias("v_mod"),
        fx.divide_integer("l_orderkey", F.lit(7)).alias("v_intdiv"),
        F.bin("l_linenumber").alias("v_bin"),
    )


@query(
    "scalar_temporal_sweep",
    oracle="""
    SELECT
      o_orderkey,
      extract(year FROM o_orderdate)::bigint    AS t_year,
      extract(month FROM o_orderdate)::bigint   AS t_month,
      extract(day FROM o_orderdate)::bigint     AS t_day,
      quarter(o_orderdate)::bigint              AS t_quarter,
      extract(hour FROM o_orderdate)::bigint    AS t_hour,
      date_trunc('month', o_orderdate)          AS t_floor_month,
      date_trunc('day', o_orderdate)            AS t_floor_day,
      strftime(o_orderdate, '%Y-%m-%d')         AS t_fmt,
      strftime(o_orderdate, '%d/%m/%Y %H:%M')   AS t_fmt2,
      o_orderdate + INTERVAL 3 DAY              AS t_plus3d,
      o_orderdate + INTERVAL 2 MONTH            AS t_plus2mo,
      o_orderdate - INTERVAL 90 MINUTE          AS t_minus90m,
      (o_orderdate <= TIMESTAMP '1997-06-30 00:00:00'
       AND TIMESTAMP '1997-01-01 00:00:00' <= o_orderdate) AS t_overlaps
    FROM orders WHERE o_orderkey < 1000
    """,
    tags=("batch", "scalar"),
)
def scalar_temporal_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXTRACT/QUARTER/FLOOR-to-unit/DATE_FORMAT (MySQL patterns)/TIMESTAMPADD/
    interval arithmetic/OVERLAPS (FunctionCatalog.scala:383-435). DATE_FORMAT
    goes through the MySQL→java.time pattern translator
    (functions.scalar.mysql_to_java_pattern ← DateFormatCallGen.scala)."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    ts = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(ts).cast("long").alias("t_year"),
        F.month(ts).cast("long").alias("t_month"),
        F.dayofmonth(ts).cast("long").alias("t_day"),
        F.quarter(ts).cast("long").alias("t_quarter"),
        F.hour(ts).cast("long").alias("t_hour"),
        F.date_trunc("month", ts).alias("t_floor_month"),
        F.date_trunc("day", ts).alias("t_floor_day"),
        fx.date_format(ts, "%Y-%m-%d").alias("t_fmt"),
        fx.date_format(ts, "%d/%m/%Y %H:%i").alias("t_fmt2"),
        fx.timestamp_add("DAY", 3, ts).alias("t_plus3d"),
        fx.timestamp_add("MONTH", 2, ts).alias("t_plus2mo"),
        fx.timestamp_add("MINUTE", -90, ts).alias("t_minus90m"),
        fx.overlaps(
            ts,
            ts,
            F.lit("1997-01-01 00:00:00").cast("timestamp"),
            F.lit("1997-06-30 00:00:00").cast("timestamp"),
        ).alias("t_overlaps"),
    )


@query(
    "scalar_conditional_sweep",
    oracle="""
    SELECT
      l_orderkey, l_linenumber,
      CASE WHEN l_quantity < 10 THEN 'low' WHEN l_quantity < 30 THEN 'mid' ELSE 'high' END AS c_case,
      nullif(l_returnflag, 'N')                          AS c_nullif,
      coalesce(nullif(l_returnflag, 'N'), 'none')        AS c_coalesce,
      (l_quantity BETWEEN 10 AND 20)                     AS c_between,
      (l_returnflag IN ('A', 'R'))                       AS c_in,
      (l_returnflag IS DISTINCT FROM l_linestatus)       AS c_distinct_from,
      (l_discount IS NULL)                               AS c_isnull,
      (l_quantity > 25 AND l_discount < 0.05 OR NOT (l_tax > 0.03)) AS c_logic
    FROM lineitem WHERE l_orderkey < 500
    """,
    tags=("batch", "scalar"),
)
def scalar_conditional_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/NULLIF/COALESCE/BETWEEN/IN/IS DISTINCT FROM/IS NULL/AND/OR/NOT
    (FunctionCatalog.scala:311-344)."""
    l = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    q, rf, ls = F.col("l_quantity"), F.col("l_returnflag"), F.col("l_linestatus")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.when(q < 10, "low").when(q < 30, "mid").otherwise("high").alias("c_case"),
        F.nullif(rf, F.lit("N")).alias("c_nullif"),
        F.coalesce(F.nullif(rf, F.lit("N")), F.lit("none")).alias("c_coalesce"),
        q.between(10, 20).alias("c_between"),
        rf.isin("A", "R").alias("c_in"),
        (~rf.eqNullSafe(ls)).alias("c_distinct_from"),
        F.col("l_discount").isNull().alias("c_isnull"),
        (((q > 25) & (F.col("l_discount") < 0.05)) | ~(F.col("l_tax") > 0.03)).alias("c_logic"),
    )


@query(
    "scalar_collection_sweep",
    oracle="""
    SELECT
      doc_id,
      toks[1]                      AS first_tok,
      toks[len(toks)]              AS last_tok,
      len(toks)                    AS n_toks,
      CASE WHEN len(toks) = 1 THEN toks[1] END AS elem,
      to_json({'id': doc_id, 'lang': lang})::VARCHAR AS rec,
      ('en' = lang)                AS is_en
    FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks
          FROM documents WHERE doc_id < 100) t
    """,
    tags=("batch", "scalar"),
)
def scalar_collection_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARRAY constructor/ITEM (1-based)/CARDINALITY/ELEMENT/ROW constructor/
    field access (FunctionCatalog.scala:362-370). element_at matches Flink's
    1-based ITEM exactly."""
    d = (
        T(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", "lang", F.split("text", " ").alias("toks"))
    )
    toks = F.col("toks")
    return d.select(
        "doc_id",
        fx.item(toks, 1).alias("first_tok"),
        fx.item(toks, fx.cardinality(toks)).alias("last_tok"),
        fx.cardinality(toks).cast("long").alias("n_toks"),
        fx.element(F.when(fx.cardinality(toks) == 1, toks).otherwise(toks)).alias("elem"),
        # ROW constructor exercised as a real struct, then JSON-rendered: the
        # driver canonicalizer (pandas sort_values) can't sort dict cells
        F.to_json(F.struct(F.col("doc_id").alias("id"), F.col("lang").alias("lang"))).alias(
            "rec"
        ),
        (F.lit("en") == F.col("lang")).alias("is_en"),
    )


@query(
    "json_props_extract",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS sum_k,
           min(json_extract(props, '$.k')::BIGINT) AS min_k,
           max(json_extract(props, '$.k')::BIGINT) AS max_k
    FROM events GROUP BY event_type
    """,
    tags=("batch", "scalar", "exceeds"),
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEEDS the reference: Flink 1.6 has no JSON scalar functions
    (SURVEY.md §2.9 note); Spark's from_json parses the events.props JSON
    column JVM-side (schema'd struct, no UDF)."""
    e = T(spark, sf_dir, "events")
    parsed = e.select(
        "event_type", F.from_json("props", "k long").alias("p")
    )
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("p.k").alias("sum_k"),
        F.min("p.k").alias("min_k"),
        F.max("p.k").alias("max_k"),
    )
