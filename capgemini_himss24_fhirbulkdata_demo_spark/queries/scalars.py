"""Scalar-function batteries: string / date-time / math / conditional
(SURVEY §2B Scalar rows; reference anchors: split-key extract
``FetchBulkData/__init__.py:218`` T19, regex rename ``:706`` K5,
ISO-date compare ``:481`` T10, quantity math ``:489-493``).

All expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen) — never Python UDFs (SURVEY §4.3.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import register


@register(
    "q50_string_funcs",
    oracle="""
    SELECT p_partkey,
           CONCAT_WS('-', p_brand, p_type) AS brand_type,
           UPPER(p_name) AS uname,
           LOWER(p_brand) AS lbrand,
           SUBSTRING(p_name, 1, 8) AS name8,
           LENGTH(p_name) AS name_len,
           LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
           REPLACE(p_brand, '#', '_') AS brand_us,
           SPLIT_PART(p_type, ' ', 1) AS type_head,
           INSTR(p_type, ' ') AS first_space,
           REGEXP_EXTRACT(p_type, '([A-Z]+)', 1) AS first_word,
           REGEXP_REPLACE(p_name, '[aeiou]', '', 'g') AS devowel,
           REVERSE(p_brand) AS rbrand,
           TRIM(RPAD(p_brand, 12, ' ')) AS trimmed,
           LEVENSHTEIN(p_brand, 'Brand#11') AS lev,
           CASE WHEN p_name LIKE '%green%' THEN 1 ELSE 0 END AS is_green,
           CASE WHEN CONTAINS(p_type, 'BRASS') THEN 1 ELSE 0 END AS is_brass
    FROM part
    WHERE p_partkey <= 120
    ORDER BY p_partkey
    """,
)
def q50_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String battery: concat/case/substr/pad/regex/levenshtein/contains."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_partkey") <= 120)
        .select(
            "p_partkey",
            F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
            F.upper("p_name").alias("uname"),
            F.lower("p_brand").alias("lbrand"),
            F.substring("p_name", 1, 8).alias("name8"),
            F.length("p_name").alias("name_len"),
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
            F.replace(F.col("p_brand"), F.lit("#"), F.lit("_")).alias("brand_us"),
            F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
            F.instr(F.col("p_type"), " ").cast("bigint").alias("first_space"),
            F.regexp_extract("p_type", "([A-Z]+)", 1).alias("first_word"),
            F.regexp_replace("p_name", "[aeiou]", "").alias("devowel"),
            F.reverse(F.col("p_brand")).alias("rbrand"),
            F.trim(F.rpad("p_brand", 12, " ")).alias("trimmed"),
            F.levenshtein("p_brand", F.lit("Brand#11")).cast("bigint").alias("lev"),
            F.when(F.col("p_name").like("%green%"), 1).otherwise(0).alias("is_green"),
            F.when(F.col("p_type").contains("BRASS"), 1).otherwise(0).alias("is_brass"),
        )
        .orderBy("p_partkey")
    )


@register(
    "q51_date_funcs",
    oracle="""
    SELECT o_orderkey,
           EXTRACT(YEAR  FROM o_orderdate) AS yr,
           EXTRACT(MONTH FROM o_orderdate) AS mo,
           EXTRACT(DAY   FROM o_orderdate) AS dom,
           EXTRACT(QUARTER FROM o_orderdate) AS qtr,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS iso_day,
           STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS month_start,
           STRFTIME(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
           STRFTIME(o_orderdate - INTERVAL 1 MONTH, '%Y-%m-%d') AS minus1m,
           STRFTIME(LAST_DAY(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           DATEDIFF('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_95,
           CAST(EPOCH(o_orderdate) AS BIGINT) AS epoch_s,
           STRFTIME(TIMESTAMP '1970-01-01 00:00:00'
                    + CAST(EPOCH(o_orderdate) AS BIGINT) * INTERVAL 1 SECOND,
                    '%Y-%m-%d %H:%M:%S') AS from_epoch,
           STRFTIME(MAKE_DATE(CAST(EXTRACT(YEAR FROM o_orderdate) AS INT), 1, 1),
                    '%Y-%m-%d') AS year_start
    FROM orders
    WHERE o_orderkey <= 150
    ORDER BY o_orderkey
    """,
)
def q51_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time battery: extract, trunc, interval arithmetic, datediff,
    epoch, make_date (ISO-string reference dates: ``__init__.py:481``)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderkey") <= 150)
        .select(
            "o_orderkey",
            F.year("o_orderdate").cast("bigint").alias("yr"),
            F.month("o_orderdate").cast("bigint").alias("mo"),
            F.dayofmonth("o_orderdate").cast("bigint").alias("dom"),
            F.quarter("o_orderdate").cast("bigint").alias("qtr"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
                "month_start"
            ),
            F.date_format(
                F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"), "yyyy-MM-dd"
            ).alias("plus30"),
            F.date_format(
                F.col("o_orderdate") - F.expr("INTERVAL 1 MONTH"), "yyyy-MM-dd"
            ).alias("minus1m"),
            F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
            F.datediff(
                F.col("o_orderdate"), F.lit("1995-01-01").cast("date")
            ).cast("bigint").alias("days_since_95"),
            F.unix_timestamp("o_orderdate").alias("epoch_s"),
            F.from_unixtime(F.unix_timestamp("o_orderdate")).alias("from_epoch"),
            F.date_format(
                F.make_date(F.year("o_orderdate"), F.lit(1), F.lit(1)), "yyyy-MM-dd"
            ).alias("year_start"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "q52_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 4) AS r4,
           FLOOR(l_extendedprice) AS flr,
           CEIL(l_extendedprice) AS cl,
           ABS(l_quantity - 25) AS dist25,
           ROUND(SQRT(l_quantity), 6) AS sqrt_q,
           ROUND(POWER(l_discount, 2), 6) AS disc_sq,
           ROUND(EXP(l_discount), 6) AS e_disc,
           ROUND(LN(l_quantity), 6) AS ln_q,
           ROUND(LOG10(l_extendedprice), 6) AS log_p,
           CAST(SIGN(l_quantity - 25) AS DOUBLE) AS sgn,
           GREATEST(l_quantity, 25.0) AS gq,
           LEAST(l_quantity, 25.0) AS lq,
           CAST(l_quantity AS BIGINT) % 7 AS mod7,
           ROUND_EVEN(l_quantity / 2, 0) AS bround_halfq
    FROM lineitem
    WHERE l_orderkey <= 40
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q52_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math battery — per-row IEEE ops are bit-deterministic; transcendentals
    are rounded(6) to absorb libm differences between JVM and DuckDB."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    return (
        li.filter(F.col("l_orderkey") <= 40)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 4).alias("r4"),
            F.floor("l_extendedprice").cast("double").alias("flr"),
            F.ceil("l_extendedprice").cast("double").alias("cl"),
            F.abs(q - 25).alias("dist25"),
            F.round(F.sqrt(q), 6).alias("sqrt_q"),
            F.round(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
            F.round(F.exp("l_discount"), 6).alias("e_disc"),
            F.round(F.log(q), 6).alias("ln_q"),
            F.round(F.log10("l_extendedprice"), 6).alias("log_p"),
            F.signum(q - 25).alias("sgn"),
            F.greatest(q, F.lit(25.0)).alias("gq"),
            F.least(q, F.lit(25.0)).alias("lq"),
            (q.cast("bigint") % 7).alias("mod7"),
            F.bround(q / 2, 0).alias("bround_halfq"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "q53_conditional_null",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'rich' END AS bal_band,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_masked,
           CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END AS bal_is_null,
           IFNULL(NULLIF(c_nationkey, 0), -1) AS nk_or_neg1,
           CASE WHEN c_custkey % 2 = 0 THEN NULL ELSE c_custkey END AS odd_only
    FROM customer
    ORDER BY c_custkey
    """,
)
def q53_conditional_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/COALESCE/NULLIF/IFNULL + null-introducing expressions
    (reference tolerant-missing handling ``__init__.py:425-428,511``)."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.select(
            "c_custkey",
            F.when(F.col("c_acctbal") < 0, "debt")
            .when(F.col("c_acctbal") < 5000, "mid")
            .otherwise("rich")
            .alias("bal_band"),
            F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
                "seg_masked"
            ),
            F.when(F.col("c_acctbal").isNull(), 1).otherwise(0).alias("bal_is_null"),
            F.ifnull(F.nullif(F.col("c_nationkey"), F.lit(0)), F.lit(-1)).alias(
                "nk_or_neg1"
            ),
            F.when(F.col("c_custkey") % 2 == 0, F.lit(None).cast("bigint"))
            .otherwise(F.col("c_custkey"))
            .alias("odd_only"),
        )
        .orderBy("c_custkey")
    )


@register(
    "q54_hash_funcs",
    oracle="""
    SELECT r_regionkey,
           MD5(r_name) AS name_md5,
           SHA256(r_name) AS name_sha256,
           TO_BASE64(ENCODE(r_name)) AS name_b64,
           DECODE(FROM_BASE64(TO_BASE64(ENCODE(r_name)))) AS b64_roundtrip
    FROM region
    ORDER BY r_regionkey
    """,
)
def q54_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash/encoding battery: md5 / sha2-256 / base64
    (reference SHA-384 digest ``__init__.py:95``, base64url ``:88-105``)."""
    region = load_table(spark, sf_dir, "region")
    return (
        region.select(
            "r_regionkey",
            F.md5(F.col("r_name").cast("binary")).alias("name_md5"),
            F.sha2(F.col("r_name").cast("binary"), 256).alias("name_sha256"),
            F.base64(F.col("r_name").cast("binary")).alias("name_b64"),
            F.decode(
                F.unbase64(F.base64(F.col("r_name").cast("binary"))), "UTF-8"
            ).alias("b64_roundtrip"),
        )
        .orderBy("r_regionkey")
    )


@register(
    "q55_misc_scalars",
    oracle="""
    SELECT c_custkey,
           (NULLIF(c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM
            NULLIF(c_mktsegment, 'AUTOMOBILE')) AS nullsafe_eq,
           REGEXP_MATCHES(c_name, 'Customer#0*1[0-9]$') AS rlike_hit,
           TRANSLATE(c_mktsegment, 'AEIOU', 'aeiou') AS translated,
           PRINTF('%s|%05d', c_mktsegment, c_custkey) AS formatted
    FROM customer
    WHERE c_custkey <= 60
    ORDER BY c_custkey
    """,
)
def q55_misc_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remaining declared scalar surface: null-safe equality (<=>),
    rlike, translate, format_string (SURVEY §2B Filter + Scalar rows).

    The null-safe operand pair is NULL on exactly one side for
    BUILDING/AUTOMOBILE customers — exercising the NULL<=>NULL=true
    and NULL<=>x=false branches the plain = operator can't.
    """
    cust = load_table(spark, sf_dir, "customer")
    left = F.nullif("c_mktsegment", F.lit("BUILDING"))
    right = F.nullif("c_mktsegment", F.lit("AUTOMOBILE"))
    return (
        cust.filter(F.col("c_custkey") <= 60)
        .select(
            "c_custkey",
            left.eqNullSafe(right).alias("nullsafe_eq"),
            F.col("c_name").rlike("Customer#0*1[0-9]$").alias("rlike_hit"),
            F.translate("c_mktsegment", "AEIOU", "aeiou").alias("translated"),
            F.format_string("%s|%05d", "c_mktsegment", "c_custkey").alias("formatted"),
        )
        .orderBy("c_custkey")
    )


@register(
    "q70_engine_hashes",
    oracle="""
    SELECT COUNT(*) AS n, TRUE AS xx_unique, TRUE AS h32_unique,
           TRUE AS crc_unique, TRUE AS mono_unique
    FROM region
    """,
)
def q70_engine_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-native hash battery (SURVEY §2B Hash/misc row) in
    invariant form: xxhash64 / hash / crc32 /
    monotonically_increasing_id values are Spark-specific by design,
    so the raw values can never cross engines — instead the query
    emits the exact row count plus collision-freedom booleans
    (distinct hashes = rows on this key space; mono ids unique),
    which a DuckDB twin states as COUNT(*) + literal TRUE (r6
    verdict's invariant-form conversion — this used to be a
    rows-only check the driver could only record as ``no_oracle``).
    A broken hash (constant, truncated, or null-collapsing) drives
    any of the booleans false, so the check is refutable, not
    vacuous."""
    region = load_table(spark, sf_dir, "region")
    hashed = region.select(
        "r_regionkey",
        F.xxhash64("r_name").alias("xx"),
        F.hash("r_name").alias("h32"),
        F.crc32(F.col("r_name").cast("binary")).alias("crc"),
        F.monotonically_increasing_id().alias("mono"),
    )
    return hashed.agg(
        F.count("*").alias("n"),
        F.countDistinct("xx").alias("n_xx"),
        F.countDistinct("h32").alias("n_h32"),
        F.countDistinct("crc").alias("n_crc"),
        F.countDistinct("mono").alias("n_mono"),
    ).select(
        "n",
        (F.col("n_xx") == F.col("n")).alias("xx_unique"),
        (F.col("n_h32") == F.col("n")).alias("h32_unique"),
        (F.col("n_crc") == F.col("n")).alias("crc_unique"),
        (F.col("n_mono") == F.col("n")).alias("mono_unique"),
    )


@register(
    "q97_try_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(o_totalprice AS DOUBLE) / NULLIF(o_orderkey % 5, 0) AS safe_div,
           TRY_CAST(o_orderpriority AS INTEGER) AS bad_int,
           TRY_CAST(SUBSTRING(o_orderpriority, 1, 1) AS INTEGER) AS prio_digit,
           TRY_CAST(o_orderdate AS DATE) AS ok_date,
           CAST(CASE WHEN o_orderkey % 3 = 0 THEN NULL
                     ELSE CAST(o_totalprice AS DECIMAL(18,2)) END
                  + CAST(1 AS DECIMAL(18,2)) AS DOUBLE) AS null_prop_add
    FROM orders
    WHERE o_orderkey <= 500
    ORDER BY o_orderkey
    """,
)
def q97_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic: ``try_divide`` (NULL on /0 instead of an
    error — mirrored as NULLIF-guarded division in the oracle),
    ``try_cast`` of malformed / well-formed strings, and NULL
    propagation through decimal addition (reference tolerant-missing
    semantics ``__init__.py:425-428`` lifted to arithmetic)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    return (
        orders.select(
            "o_orderkey",
            F.try_divide(
                F.col("o_totalprice").cast("double"), F.col("o_orderkey") % 5
            ).alias("safe_div"),
            F.col("o_orderpriority").try_cast("int").alias("bad_int"),
            F.substring("o_orderpriority", 1, 1).try_cast("int").alias("prio_digit"),
            F.col("o_orderdate").try_cast("date").alias("ok_date"),
            # emitted as DOUBLE, not DECIMAL: raw decimal output columns
            # are the one type class the driver's comparison has
            # hash-mismatched on (x125, r5); scale-2 decimal→double is
            # correctly rounded and identical on both engines
            (
                F.when(F.col("o_orderkey") % 3 == 0, F.lit(None))
                .otherwise(F.col("o_totalprice"))
                .cast("decimal(18,2)")
                + F.lit(1).cast("decimal(18,2)")
            )
            .cast("double")
            .alias("null_prop_add"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "q98_bitwise",
    oracle="""
    SELECT l_orderkey,
           CAST(BIT_AND(l_partkey) AS BIGINT) AS and_part,
           CAST(BIT_OR(l_partkey) AS BIGINT) AS or_part,
           CAST(BIT_XOR(l_partkey) AS BIGINT) AS xor_part,
           CAST(SUM(BIT_COUNT(l_partkey)) AS BIGINT) AS popcount_sum,
           CAST(MIN(l_partkey << 2) AS BIGINT) AS min_shl,
           CAST(MAX(l_partkey >> 1) AS BIGINT) AS max_shr,
           CAST(MIN(l_partkey & 255) AS BIGINT) AS min_low_byte,
           CAST(MAX(l_partkey | 4096) AS BIGINT) AS max_with_flag,
           CAST(MIN(xor(l_partkey, l_suppkey)) AS BIGINT) AS min_xor_pair
    FROM lineitem
    WHERE l_orderkey <= 200
    GROUP BY l_orderkey
    ORDER BY l_orderkey
    """,
)
def q98_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise battery: scalar shifts/and/or/xor/popcount plus the
    ``bit_and``/``bit_or``/``bit_xor`` aggregates (engine-surface
    completeness; both engines define identical two's-complement
    semantics on 64-bit ints)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    pk = F.col("l_partkey")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.bit_and(pk).alias("and_part"),
            F.bit_or(pk).alias("or_part"),
            F.bit_xor(pk).alias("xor_part"),
            F.sum(F.bit_count(pk)).cast("bigint").alias("popcount_sum"),
            F.min(F.shiftleft(pk, 2)).cast("bigint").alias("min_shl"),
            F.max(F.shiftright(pk, 1)).cast("bigint").alias("max_shr"),
            F.min(pk.bitwiseAND(F.lit(255))).cast("bigint").alias("min_low_byte"),
            F.max(pk.bitwiseOR(F.lit(4096))).cast("bigint").alias("max_with_flag"),
            F.min(pk.bitwiseXOR(F.col("l_suppkey"))).cast("bigint").alias("min_xor_pair"),
        )
        .orderBy("l_orderkey")
    )
