"""Semi-structured surface: arrays (+ higher-order functions), maps,
JSON extraction (SURVEY §2B Array/Map/JSON rows).

Reference anchors: the nested-array rewrites T7/T11/T12/T15
(``FetchBulkData/__init__.py:469-471,489-528``) exercise exactly these
primitives (transform/filter/element_at) in the fidelity pipeline
(transforms/fhir.py); here the same primitives are declared as
oracle-checked engine surface on integer data (exact arithmetic).

Oracle notes: DuckDB ``RANGE(a,b)`` is end-exclusive (Spark
``sequence`` is inclusive) and DuckDB integer SUMs widen to HUGEINT —
every oracle casts back to BIGINT so pandas/hash comparison sees
identical types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import register


def _seq(start, stop_incl):
    """array<bigint> sequence [start..stop_incl], both ends bigint."""
    return F.sequence(F.lit(start).cast("bigint"), stop_incl.cast("bigint"))


def _aj(col):
    """Serialize an array column to a ','-joined string.

    The driver harness canonicalizes result cells through pandas, which
    cannot hash list cells — every registered query therefore surfaces
    arrays as deterministic strings (the array op under test is
    unchanged; only the output surface is stringified). DuckDB twin:
    ``ARRAY_TO_STRING(..., ',')``.
    """
    return F.array_join(col.cast("array<string>"), ",")


@register(
    "q60_array_hof",
    oracle="""
    SELECT n_nationkey,
           ARRAY_TO_STRING(rng, ',') AS seq,
           LEN(rng) AS seq_size,
           CAST(LIST_SUM(rng) AS BIGINT) AS seq_sum,
           ARRAY_TO_STRING(LIST_TRANSFORM(rng, x -> x * 2), ',') AS doubled,
           COALESCE(ARRAY_TO_STRING(LIST_FILTER(rng, x -> x % 2 = 0), ','), '')
             AS evens,
           CAST(LIST_SUM(LIST_TRANSFORM(rng, x -> x * x)) AS BIGINT) AS sum_sq,
           rng[1] AS first_elem,
           rng[-1] AS last_elem,
           LIST_CONTAINS(rng, 3) AS has_3,
           ARRAY_TO_STRING(LIST_REVERSE(LIST_SORT(rng)), ',') AS desc_sorted
    FROM (SELECT n_nationkey,
                 RANGE(CAST(1 AS BIGINT), CAST((n_nationkey % 5) + 3 AS BIGINT)) AS rng
          FROM nation)
    ORDER BY n_nationkey
    """,
)
def q60_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array construction + higher-order functions on exact int data:
    sequence, size, aggregate-sum, transform, filter, element_at,
    array_contains, sort_array. These are the codegen'd primitives the
    FHIR nested rewrites are built on."""
    nation = load_table(spark, sf_dir, "nation")
    df = nation.select("n_nationkey", _seq(1, (F.col("n_nationkey") % 5) + 2).alias("seq"))
    s = F.col("seq")
    return df.select(
        "n_nationkey",
        _aj(s).alias("seq"),
        F.size(s).cast("bigint").alias("seq_size"),
        F.aggregate(s, F.lit(0).cast("bigint"), lambda a, x: a + x).alias("seq_sum"),
        _aj(F.transform(s, lambda x: x * 2)).alias("doubled"),
        _aj(F.filter(s, lambda x: x % 2 == 0)).alias("evens"),
        F.aggregate(
            F.transform(s, lambda x: x * x), F.lit(0).cast("bigint"), lambda a, x: a + x
        ).alias("sum_sq"),
        F.element_at(s, 1).alias("first_elem"),
        F.element_at(s, -1).alias("last_elem"),
        F.array_contains(s, F.lit(3).cast("bigint")).alias("has_3"),
        _aj(F.reverse(F.sort_array(s))).alias("desc_sorted"),
    ).orderBy("n_nationkey")


@register(
    "q61_array_setops",
    oracle="""
    SELECT n_nationkey,
           ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(a || b)), ',') AS union_ab,
           COALESCE(ARRAY_TO_STRING(LIST_SORT(LIST_INTERSECT(a, b)), ','), '')
             AS intersect_ab,
           COALESCE(ARRAY_TO_STRING(
             LIST_SORT(LIST_FILTER(LIST_DISTINCT(a), x -> NOT LIST_CONTAINS(b, x))),
             ','), '') AS except_ab,
           ARRAY_TO_STRING(a || b, ',') AS concat_ab
    FROM (SELECT n_nationkey,
                 RANGE(CAST(1 AS BIGINT), CAST((n_nationkey % 4) + 3 AS BIGINT)) AS a,
                 RANGE(CAST(2 AS BIGINT), CAST((n_nationkey % 3) + 4 AS BIGINT)) AS b
          FROM nation)
    ORDER BY n_nationkey
    """,
)
def q61_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra: union/intersect/except/concat, sorted so
    set-operation internal ordering is never observable."""
    nation = load_table(spark, sf_dir, "nation")
    df = nation.select(
        "n_nationkey",
        _seq(1, (F.col("n_nationkey") % 4) + 2).alias("a"),
        _seq(2, (F.col("n_nationkey") % 3) + 3).alias("b"),
    )
    a, b = F.col("a"), F.col("b")
    return df.select(
        "n_nationkey",
        _aj(F.sort_array(F.array_union(a, b))).alias("union_ab"),
        _aj(F.sort_array(F.array_intersect(a, b))).alias("intersect_ab"),
        _aj(F.sort_array(F.array_except(a, b))).alias("except_ab"),
        _aj(F.concat(a, b)).alias("concat_ab"),
    ).orderBy("n_nationkey")


@register(
    "q62_explode",
    oracle="""
    SELECT n_nationkey,
           UNNEST(rng) AS elem,
           UNNEST(RANGE(LEN(rng))) AS pos
    FROM (SELECT n_nationkey,
                 RANGE(CAST(1 AS BIGINT), CAST((n_nationkey % 4) + 2 AS BIGINT)) AS rng
          FROM nation)
    ORDER BY n_nationkey, pos
    """,
)
def q62_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (array → rows with position); DuckDB zips parallel
    UNNESTs at the same select level."""
    nation = load_table(spark, sf_dir, "nation")
    df = nation.select(
        "n_nationkey", _seq(1, (F.col("n_nationkey") % 4) + 1).alias("rng")
    )
    return (
        df.select("n_nationkey", F.posexplode("rng").alias("pos", "elem"))
        .select(
            "n_nationkey",
            F.col("elem").alias("elem"),
            F.col("pos").cast("bigint").alias("pos"),
        )
        .orderBy("n_nationkey", "pos")
    )


@register(
    "q63_json_extract",
    oracle="""
    SELECT event_id,
           CAST(props ->> '$.k' AS BIGINT) AS k_val,
           CASE WHEN props ->> '$.k' IS NULL THEN 0 ELSE 1 END AS has_k,
           props ->> '$.k' AS k_str,
           props ->> '$.missing' AS missing_str
    FROM events
    WHERE event_id <= 200
    ORDER BY event_id
    """,
)
def q63_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from a string column (get_json_object —
    reference JSON parse anchor ``__init__.py:359,406``)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return (
        ev.filter(F.col("event_id") <= 200)
        .select(
            "event_id",
            k.cast("bigint").alias("k_val"),
            F.when(k.isNull(), 0).otherwise(1).alias("has_k"),
            # json_tuple: multi-field extraction in one pass
            F.json_tuple("props", "k", "missing").alias("k_str", "missing_str"),
        )
        .orderBy("event_id")
    )


@register(
    "q64_from_json_map",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(props ->> '$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MIN(CAST(props ->> '$.k' AS BIGINT)) AS BIGINT) AS min_k,
           CAST(MAX(CAST(props ->> '$.k' AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q64_from_json_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json → MAP<STRING,STRING> → element_at, aggregated.

    The declared-with-fallback schema pattern from SURVEY §1.2: parse
    the JSON props column into a typed map, tolerate missing keys as
    nulls (null-skipping aggregates), keep ints exact.
    """
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    k = F.element_at(m, "k").cast("bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "q65_to_json_struct",
    oracle="""
    SELECT r_regionkey,
           '{"key":' || r_regionkey || ',"name":"' || r_name || '"}' AS packed
    FROM region
    ORDER BY r_regionkey
    """,
)
def q65_to_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_json(struct(...)) — the NDJSON-sink serialization primitive
    (``__init__.py:535`` T18). Field order in to_json follows struct
    field order, so the oracle string-builds the identical shape."""
    region = load_table(spark, sf_dir, "region")
    return (
        region.select(
            "r_regionkey",
            F.to_json(
                F.struct(
                    F.col("r_regionkey").alias("key"), F.col("r_name").alias("name")
                )
            ).alias("packed"),
        )
        .orderBy("r_regionkey")
    )


@register(
    "q66_map_funcs",
    oracle="""
    SELECT n_nationkey,
           CAST(m['nk'][1] AS BIGINT) AS nk_val,
           ARRAY_TO_STRING(LIST_SORT(MAP_KEYS(m)), ',') AS keys_sorted,
           CAST(CARDINALITY(m) AS BIGINT) AS n_keys
    FROM (SELECT n_nationkey,
                 MAP(['nk', 'rk'], [n_nationkey, n_regionkey]) AS m
          FROM nation)
    ORDER BY n_nationkey
    """,
)
def q66_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + element_at/map_keys/size (SURVEY §2B Map row)."""
    nation = load_table(spark, sf_dir, "nation")
    m = F.create_map(
        F.lit("nk"), F.col("n_nationkey"), F.lit("rk"), F.col("n_regionkey")
    )
    df = nation.select("n_nationkey", m.alias("m"))
    return df.select(
        "n_nationkey",
        F.element_at("m", "nk").cast("bigint").alias("nk_val"),
        _aj(F.sort_array(F.map_keys("m"))).alias("keys_sorted"),
        F.size(F.map_keys("m")).cast("bigint").alias("n_keys"),
    ).orderBy("n_nationkey")


@register(
    "q67_hof_predicates",
    oracle="""
    SELECT n_nationkey,
           LIST_HAS_ANY(a, [3]) AS any_3,
           LEN(LIST_FILTER(a, x -> x % 2 = 0)) = LEN(a) AS all_even,
           ARRAY_TO_STRING(LIST_TRANSFORM(LIST_ZIP(a, LIST_REVERSE(a)),
                          p -> CAST(p[1] + p[2] AS BIGINT)), ',') AS zip_sums,
           ARRAY_TO_STRING(
             LIST_SORT(FLATTEN([a, LIST_TRANSFORM(a, x -> x * 10)])), ',') AS flat
    FROM (SELECT n_nationkey,
                 RANGE(CAST(2 AS BIGINT), CAST((n_nationkey % 4) * 2 + 4 AS BIGINT)) AS a
          FROM nation)
    ORDER BY n_nationkey
    """,
)
def q67_hof_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order predicates + zip: exists / forall / zip_with /
    flatten (SURVEY §2B Array row — completes the HOF battery).

    DuckDB twins: exists → LIST_HAS_ANY, forall → filter-length
    identity, zip_with → LIST_TRANSFORM over LIST_ZIP (struct fields
    p[1], p[2]).
    """
    nation = load_table(spark, sf_dir, "nation")
    df = nation.select(
        "n_nationkey",
        _seq(2, (F.col("n_nationkey") % 4) * 2 + 3).alias("a"),
    )
    a = F.col("a")
    return df.select(
        "n_nationkey",
        F.exists(a, lambda x: x == 3).alias("any_3"),
        F.forall(a, lambda x: x % 2 == 0).alias("all_even"),
        _aj(F.zip_with(a, F.reverse(a), lambda x, y: (x + y).cast("bigint"))).alias(
            "zip_sums"
        ),
        _aj(
            F.sort_array(F.flatten(F.array(a, F.transform(a, lambda x: x * 10))))
        ).alias("flat"),
    ).orderBy("n_nationkey")


@register(
    "q68_map_transform",
    oracle="""
    WITH base AS (
      SELECT n_nationkey,
             MAP(['a', 'b'], [CAST(n_nationkey AS BIGINT),
                              CAST(n_regionkey AS BIGINT)]) AS m
      FROM nation)
    SELECT n_nationkey,
           ARRAY_TO_STRING(LIST_TRANSFORM(MAP_ENTRIES(m), e -> e.key), ',')
             AS doubled_keys,
           ARRAY_TO_STRING(LIST_TRANSFORM(MAP_ENTRIES(m),
                          e -> CAST(e.value * 2 AS BIGINT)), ',') AS doubled_values,
           COALESCE(ARRAY_TO_STRING(LIST_SORT(LIST_TRANSFORM(
               LIST_FILTER(MAP_ENTRIES(m), e -> e.value % 2 = 0),
               e -> CAST(e.value AS BIGINT))), ','), '') AS even_values,
           CAST(CARDINALITY(MAP_CONCAT(m, MAP(['c'], [CAST(100 AS BIGINT)])))
                AS BIGINT) AS n_after_concat,
           CAST(MAP_FROM_ENTRIES(MAP_ENTRIES(m))['a'][1] AS BIGINT) AS rebuilt_a
    FROM base
    ORDER BY n_nationkey
    """,
)
def q68_map_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map HOFs: transform_values / map_filter / map_concat /
    map_from_entries / map_entries (SURVEY §2B Map row — completes the
    battery). Maps surface as entry arrays (struct<key,value>) because
    raw MAP wire formats differ between engines."""
    nation = load_table(spark, sf_dir, "nation")
    m = F.create_map(
        F.lit("a"), F.col("n_nationkey").cast("bigint"),
        F.lit("b"), F.col("n_regionkey").cast("bigint"),
    )
    df = nation.select("n_nationkey", m.alias("m"))
    doubled = F.map_entries(F.transform_values(F.col("m"), lambda k, v: v * 2))
    return df.select(
        "n_nationkey",
        _aj(F.transform(doubled, lambda e: e.key)).alias("doubled_keys"),
        _aj(F.transform(doubled, lambda e: e.value)).alias("doubled_values"),
        _aj(
            F.sort_array(
                F.map_values(F.map_filter(F.col("m"), lambda k, v: v % 2 == 0))
            )
        ).alias("even_values"),
        F.size(
            F.map_concat(F.col("m"), F.create_map(F.lit("c"), F.lit(100).cast("bigint")))
        ).cast("bigint").alias("n_after_concat"),
        F.element_at(
            F.map_from_entries(F.map_entries(F.col("m"))), "a"
        ).alias("rebuilt_a"),
    ).orderBy("n_nationkey")


@register(
    "q78_variant",
    oracle="""
    SELECT event_id,
           CAST(JSON_EXTRACT(props, '$.k') AS BIGINT) AS k,
           JSON_EXTRACT_STRING(props, '$.missing') AS missing_key,
           CASE WHEN CAST(JSON_EXTRACT(props, '$.k') AS BIGINT) >= 50
                THEN 'high' ELSE 'low' END AS k_band
    FROM events
    WHERE CAST(JSON_EXTRACT(props, '$.k') AS BIGINT) IS NOT NULL
    ORDER BY event_id
    """,
)
def q78_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT surface: parse_json -> variant_get typed
    extraction + try_variant_get null-on-miss, banded downstream. The
    oracle reads the same paths with DuckDB's JSON extractors —
    variant is Spark's binary-encoded answer to the same
    semi-structured access pattern (shredded, no per-row re-parse).

    Scale: variant parse happens once per row in the scan projection;
    at 100 TB the parsed column would be materialized (or arrive as
    parquet VARIANT) so path access is O(paths), not O(re-parse).
    """
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "bigint")
    return (
        ev.select(
            "event_id",
            k.alias("k"),
            F.try_variant_get(v, "$.missing", "string").alias("missing_key"),
            F.when(k >= 50, F.lit("high")).otherwise(F.lit("low")).alias("k_band"),
        )
        .filter(F.col("k").isNotNull())
        .orderBy("event_id")
    )
