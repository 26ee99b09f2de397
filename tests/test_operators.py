"""Unit tests for the composed operators (operators/), checked against
independent formulations on the fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from capgemini_himss24_fhirbulkdata_demo_spark.catalog import load_table
from capgemini_himss24_fhirbulkdata_demo_spark.operators import (
    asof_join,
    cosine_topk,
    dedup_first_wins,
    lsh_bucket,
    near_dup_pairs,
    top_k_per_group,
)
from capgemini_himss24_fhirbulkdata_demo_spark.operators.similarity import hyperplanes

from .conftest import SF_DIR


def test_asof_join_backward(spark):
    trades = spark.createDataFrame(
        [(1, 10), (1, 25), (2, 5)], "sym INT, t INT"
    )
    quotes = spark.createDataFrame(
        [(1, 8, 100.0), (1, 20, 101.0), (1, 30, 102.0), (2, 9, 50.0)],
        "sym INT, qt INT, px DOUBLE",
    )
    got = {
        (r.sym, r.t): (r.qt, r.px)
        for r in asof_join(
            trades, quotes, on=[("sym", "sym")], ordinal=("t", "qt")
        ).collect()
    }
    assert got[(1, 10)] == (8, 100.0)
    assert got[(1, 25)] == (20, 101.0)
    assert got[(2, 5)] == (None, None)  # no quote at-or-before -> left row kept


def test_asof_join_forward(spark):
    left = spark.createDataFrame([(1, 10)], "k INT, t INT")
    right = spark.createDataFrame([(1, 9, "a"), (1, 12, "b"), (1, 15, "c")],
                                  "k INT, rt INT, v STRING")
    r = asof_join(left, right, on=[("k", "k")], ordinal=("t", "rt"),
                  direction="forward").first()
    assert (r.rt, r.v) == (12, "b")


def test_top_k_matches_query(spark):
    orders = load_table(spark, SF_DIR, "orders")
    got = top_k_per_group(
        orders,
        ["o_custkey"],
        [F.desc("o_totalprice"), F.col("o_orderkey")],
        3,
        rank_col="rn",
    ).select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    from capgemini_himss24_fhirbulkdata_demo_spark.queries import QUERIES

    exp = QUERIES["q31_topk_per_group"](spark, SF_DIR)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_dedup_first_wins_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "b", 2), (1, "a", 1), (2, "c", 9)], "k INT, v STRING, ord INT"
    )
    got = sorted(map(tuple, dedup_first_wins(df, ["k"], ["ord"]).collect()))
    assert got == [(1, "a", 1), (2, "c", 9)]


def test_near_dup_pairs_matches_query(spark):
    docs = load_table(spark, SF_DIR, "documents")
    got = near_dup_pairs(docs, "doc_id", "text").withColumnRenamed(
        "id_a", "doc_a"
    ).withColumnRenamed("id_b", "doc_b")
    from capgemini_himss24_fhirbulkdata_demo_spark.queries import QUERIES

    exp = QUERIES["x02_dedup_minhash"](spark, SF_DIR)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_cosine_topk_bruteforce_and_bucketed(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    got = cosine_topk(q, emb, "vec_id", "vec_id", "embedding", "embedding", k=2)
    rows = got.collect()
    assert {r.query_id for r in rows} == {0, 1, 2}
    assert all(-1.0 <= r.cosine <= 1.0 + 1e-9 for r in rows)
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.cosine)
    for scores in per_q.values():
        assert scores == sorted(scores, reverse=True)

    planes = hyperplanes(4, 64)
    b = emb.withColumn("bucket", lsh_bucket(F.col("embedding"), planes))
    qb = b.filter(F.col("vec_id") < 3)
    bucketed = cosine_topk(
        qb, b, "vec_id", "vec_id", "embedding", "embedding", k=2, bucket_col="bucket"
    ).collect()
    # bucketed results are a subset of each query's full ranking by construction
    assert all(-1.0 <= r.cosine <= 1.0 + 1e-9 for r in bucketed)


def test_salted_aggregate_equals_plain(spark):
    from pyspark.sql import functions as F

    from capgemini_himss24_fhirbulkdata_demo_spark.operators import salted_aggregate

    li = load_table(spark, SF_DIR, "lineitem")
    got = salted_aggregate(
        li,
        ["l_returnflag"],
        aggs=lambda: [
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("psum"),
            F.count("*").alias("pcnt"),
        ],
        merge=lambda: [
            F.sum("psum").cast("double").alias("sum_qty"),
            F.sum("pcnt").alias("n"),
        ],
    )
    exp = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        F.count("*").alias("n"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_salted_join_equals_plain(spark):
    from pyspark.sql import functions as F

    from capgemini_himss24_fhirbulkdata_demo_spark.operators import salted_join

    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderpriority")
    got = (
        salted_join(li, orders, on=[("l_orderkey", "o_orderkey")], n_salts=4)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    exp = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_pandas_udf_cosine_matches_builtin(spark):
    import math

    from pyspark.sql import functions as F

    from capgemini_himss24_fhirbulkdata_demo_spark.operators.pandas_udfs import (
        centroid_per_group,
        cosine_to_query_udf,
        vector_norm_udf,
    )
    from capgemini_himss24_fhirbulkdata_demo_spark.operators.similarity import (
        cosine_dot,
        vector_norm,
    )

    emb = load_table(spark, SF_DIR, "embeddings").limit(50)
    qvec = [r for r in emb.filter(F.col("vec_id") == 0).collect()][0].embedding

    got = emb.select(
        "vec_id",
        cosine_to_query_udf(list(qvec))(F.col("embedding")).alias("c_udf"),
        vector_norm_udf()(F.col("embedding")).alias("n_udf"),
    )
    qcol = F.array(*[F.lit(float(x)) for x in qvec])
    exp = emb.select(
        "vec_id",
        (cosine_dot(F.col("embedding"), qcol)
         / (vector_norm(F.col("embedding")) * vector_norm(qcol))).alias("c_ref"),
        vector_norm(F.col("embedding")).alias("n_ref"),
    )
    joined = {r.vec_id: r for r in got.join(exp, "vec_id").collect()}
    for r in joined.values():
        assert math.isclose(r.c_udf, r.c_ref, rel_tol=1e-9), (r.c_udf, r.c_ref)
        assert math.isclose(r.n_udf, r.n_ref, rel_tol=1e-9)

    cents = centroid_per_group(
        load_table(spark, SF_DIR, "embeddings"), "label", "embedding"
    ).collect()
    assert len(cents) >= 2
    assert all(len(r.centroid) == 64 for r in cents)


def test_ivf_recall_vs_bruteforce(spark):
    from pyspark.sql import functions as F

    from capgemini_himss24_fhirbulkdata_demo_spark.queries import QUERIES

    brute = QUERIES["x10_knn_bruteforce"](spark, SF_DIR).collect()
    ivf = QUERIES["x12_knn_ivf"](spark, SF_DIR).collect()
    brute_sets = {}
    for r in brute:
        brute_sets.setdefault(r.q_id, set()).add(r.c_id)
    ivf_sets = {}
    for r in ivf:
        ivf_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    # every query answered; probe search finds a nonempty neighbor set
    assert set(ivf_sets) == set(brute_sets)
    # 2-probe recall over a 3-bit quantizer: expect meaningful overlap
    hits = sum(len(ivf_sets[q] & brute_sets[q]) for q in brute_sets)
    total = sum(len(brute_sets[q]) for q in brute_sets)
    assert hits / total >= 0.2, f"recall {hits}/{total}"
    # deterministic across runs
    ivf2 = QUERIES["x12_knn_ivf"](spark, SF_DIR).collect()
    assert sorted(map(tuple, ivf)) == sorted(map(tuple, ivf2))


def test_ivf_dim_param_and_empty_guard(spark):
    import pytest
    from pyspark.sql import functions as F

    from capgemini_himss24_fhirbulkdata_demo_spark.operators.similarity import (
        ivf_assign,
        probe_dim,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    # passing dim from metadata matches the probed build bit-for-bit
    _, cent_probed = ivf_assign(emb, "vec_id", "embedding", n_lists=8)
    _, cent_given = ivf_assign(emb, "vec_id", "embedding", n_lists=8, dim=64)
    assert sorted(map(tuple, cent_probed.collect())) == sorted(
        map(tuple, cent_given.collect())
    )
    # empty table: clear error, not an opaque TypeError mid-plan-build
    empty = emb.filter(F.lit(False))
    with pytest.raises(ValueError, match="empty"):
        probe_dim(empty, "embedding")


def test_shingle_short_docs(spark):
    from pyspark.sql import functions as F

    from capgemini_himss24_fhirbulkdata_demo_spark.operators.dedup import shingle

    df = spark.createDataFrame(
        [(1, "one"), (2, "two words"), (3, "a b c")], "id INT, text STRING"
    )
    got = {r.id: r.sh for r in df.select("id", shingle(F.col("text"), 2).alias("sh")).collect()}
    assert got[1] == []  # single token -> empty, not a crash
    assert got[2] == ["two words"]
    assert sorted(got[3]) == ["a b", "b c"]


def test_salted_join_rejects_outer(spark):
    import pytest as _pytest

    from capgemini_himss24_fhirbulkdata_demo_spark.operators import salted_join

    a = spark.createDataFrame([(1, 1.0)], "k INT, v DOUBLE")
    b = spark.createDataFrame([(1, 2.0)], "k2 INT, w DOUBLE")
    with _pytest.raises(ValueError, match="multiplicity"):
        salted_join(a, b, on=[("k", "k2")], how="full")


def test_zscore_per_group_matches_builtin(spark):
    import math

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from capgemini_himss24_fhirbulkdata_demo_spark.operators.pandas_udfs import (
        zscore_per_group,
    )

    cust = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    got = {r.c_custkey: r.zscore for r in zscore_per_group(
        cust, "c_nationkey", "c_acctbal").collect()}
    w = Window.partitionBy("c_nationkey")
    exp_df = cust.select(
        "c_custkey",
        ((F.col("c_acctbal") - F.avg("c_acctbal").over(w))
         / F.stddev_samp("c_acctbal").over(w)).alias("z"),
    )
    exp = {r.c_custkey: r.z for r in exp_df.collect()}
    assert set(got) == set(exp)
    for k in got:
        e = exp[k] if exp[k] is not None else 0.0
        assert math.isclose(got[k], e, rel_tol=1e-9, abs_tol=1e-12), (k, got[k], e)


def test_connected_components_chain_graph(spark):
    """Multi-hop chain (diameter 4) forces several propagation rounds;
    two separate components plus an isolated pair."""
    from capgemini_himss24_fhirbulkdata_demo_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (20, 21)],
        "id_a BIGINT, id_b BIGINT",
    )
    got = {
        r.v: r.component for r in connected_components(pairs, "id_a", "id_b").collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }


def test_ivf_full_probe_equals_bruteforce(spark):
    """Probing every list makes IVF search exhaustive — results must
    equal brute-force cosine top-k exactly (same fold arithmetic)."""
    from capgemini_himss24_fhirbulkdata_demo_spark.operators.similarity import (
        cosine_topk,
        ivf_assign,
        ivf_topk,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    assigned, cents = ivf_assign(emb, "vec_id", "embedding", n_lists=8, dim=64)
    n_lists = cents.count()
    q = emb.filter(F.col("vec_id") < 5)
    ivf = ivf_topk(
        q, assigned, cents, "vec_id", "vec_id", "embedding", "embedding",
        k=3, n_probe=n_lists,
    ).collect()
    brute = cosine_topk(q, emb, "vec_id", "vec_id", "embedding", "embedding", k=3).collect()
    assert sorted((r.query_id, r.neighbor_id, r.rank) for r in ivf) == sorted(
        (r.query_id, r.neighbor_id, r.rank) for r in brute
    )


def test_ivf_sampled_training(spark):
    """train_fraction builds centroids on a hash-gated sample;
    assignment still covers the full table, results deterministic."""
    from capgemini_himss24_fhirbulkdata_demo_spark.operators.similarity import (
        ivf_assign,
        ivf_topk,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    assigned, cents = ivf_assign(
        emb, "vec_id", "embedding", n_lists=8, dim=64, train_fraction=0.5
    )
    # full-table assignment regardless of the training sample
    assert assigned.count() == emb.count()
    # fixtures have large buckets: half-sample still covers every cell
    full_cells = {r.ivf_list for r in ivf_assign(emb, "vec_id", "embedding",
                                                 n_lists=8, dim=64)[1].collect()}
    samp_cells = {r.ivf_list for r in cents.collect()}
    assert samp_cells == full_cells
    q = emb.filter(F.col("vec_id") < 3)
    out1 = ivf_topk(q, assigned, cents, "vec_id", "vec_id", "embedding",
                    "embedding", k=3, n_probe=2).collect()
    out2 = ivf_topk(q, assigned, cents, "vec_id", "vec_id", "embedding",
                    "embedding", k=3, n_probe=2).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    assert {r.query_id for r in out1} == {0, 1, 2}


def test_connected_components_unconverged_raises(spark):
    import pytest

    from capgemini_himss24_fhirbulkdata_demo_spark.operators.dedup import (
        connected_components,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 7)], "id_a BIGINT, id_b BIGINT"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, "id_a", "id_b", max_iter=2)


def test_udtf_ngram_spans_matches_declarative(spark):
    """Spark-4 Python UDTF (1 row → N typed rows, usable in FROM /
    LATERAL): bigram output must equal the declarative
    sequence+transform form the registry uses (x27) — the UDTF is
    API-surface coverage, not an alternative result."""
    from capgemini_himss24_fhirbulkdata_demo_spark.operators.udtf import register_udtfs

    register_udtfs(spark)
    docs = load_table(spark, SF_DIR, "documents").limit(20)
    docs.createOrReplaceTempView("udtf_docs")
    got = spark.sql(
        """
        SELECT d.doc_id, g.gram, g.start_tok
        FROM udtf_docs d, LATERAL ngram_spans(d.text, '2') g
        """
    ).collect()
    t = F.split(F.col("text"), " ")
    n = F.size(t)
    idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    want = (
        docs.select(
            "doc_id",
            F.posexplode(
                F.transform(
                    idx,
                    lambda i: F.concat_ws(
                        " ", F.element_at(t, i), F.element_at(t, i + 1)
                    ),
                )
            ).alias("pos", "gram"),
        )
    ).collect()
    assert sorted((r.doc_id, r.gram, r.start_tok) for r in got) == sorted(
        (r.doc_id, r.gram, r.pos) for r in want
    )
    # trigram sizes parameter: spot-check one doc
    tri = spark.sql(
        "SELECT COUNT(*) AS n FROM udtf_docs d, LATERAL ngram_spans(d.text, '3') g"
    ).collect()[0].n
    n_toks = [len([w for w in r.text.split(" ") if w]) for r in docs.collect()]
    assert tri == sum(max(k - 2, 0) for k in n_toks)


def test_scrub_text_redacts_and_counts(spark):
    from capgemini_himss24_fhirbulkdata_demo_spark.operators.pii import scrub_text

    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@sub.example.org thanks"),
            (2, "server 192.168.1.254 then call 555-0199 twice 555-0200"),
            (3, "clean row with no contact info"),
            (4, "a@b.io and 10.0.0.1"),
        ],
        "id long, text string",
    )
    out = {r["id"]: r for r in scrub_text(df).collect()}
    assert out[1]["text"] == "mail me at <EMAIL> thanks"
    assert (out[1]["n_email"], out[1]["n_ip"], out[1]["n_phone"]) == (1, 0, 0)
    assert out[2]["text"] == "server <IP> then call <PHONE> twice <PHONE>"
    assert (out[2]["n_email"], out[2]["n_ip"], out[2]["n_phone"]) == (0, 1, 2)
    assert out[3]["text"] == "clean row with no contact info"
    assert (out[3]["n_email"], out[3]["n_ip"], out[3]["n_phone"]) == (0, 0, 0)
    # the email host's dots must not be half-eaten by the IP pattern
    assert out[4]["text"] == "<EMAIL> and <IP>"
    assert (out[4]["n_email"], out[4]["n_ip"], out[4]["n_phone"]) == (1, 1, 0)
    # schema keeps original columns and appends the audit counts
    assert scrub_text(df).columns == ["id", "text", "n_email", "n_ip", "n_phone"]


def test_assign_nearest_centroid_small(spark):
    from capgemini_himss24_fhirbulkdata_demo_spark.operators.similarity import (
        assign_nearest_centroid,
    )

    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]), (4, [-0.1, 0.8])],
        "id long, v array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "ivf_list long, centroid array<double>",
    )
    out = assign_nearest_centroid(vecs, cents, "id", "v")
    got = {r["id"]: r["cluster"] for r in out.collect()}
    assert got == {1: 0, 2: 0, 3: 1, 4: 1}
    # exactly one row per input vector, original columns preserved
    assert out.count() == 4
    assert out.columns == ["id", "v", "cluster"]


def test_ivf_sampled_train_orphan_bucket_reassigned(spark):
    """A bucket whose every member fails the deterministic train gate
    gets no centroid; its members must be reassigned to the nearest
    existing centroid — searchable, not silently dropped (round-2
    verdict item 3)."""
    import hashlib

    from capgemini_himss24_fhirbulkdata_demo_spark.operators.similarity import (
        hyperplanes,
        ivf_assign,
        ivf_topk,
    )

    dim, frac = 4, 0.5
    bound = int(frac * 0xFFFF)

    def gate(i: int) -> bool:  # mirror of ivf_assign's md5 train gate
        return int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16) <= bound

    planes = hyperplanes(2, dim)  # n_lists=4 -> 2 planes

    def cell(v):  # mirror of lsh_bucket
        b = 0
        for p, coeffs in enumerate(planes):
            if sum(c * x for c, x in zip(coeffs, v)) > 0:
                b |= 1 << p
        return b

    va = [float(c) for c in planes[0]]
    vb = [-x for x in va]
    assert cell(va) != cell(vb)
    passing = [i for i in range(100) if gate(i)]
    failing = [i for i in range(100) if not gate(i)]
    rows = [(i, va) for i in passing[:3]] + [(failing[0], vb)]
    emb = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")

    assigned, cents = ivf_assign(
        emb, "vec_id", "embedding", n_lists=4, dim=dim, train_fraction=frac
    )
    # the sample really did orphan vb's cell
    assert {r.ivf_list for r in cents.collect()} == {cell(va)}
    got = {r.vec_id: r.ivf_list for r in assigned.collect()}
    assert len(got) == 4  # full-table assignment, no row loss
    assert got[failing[0]] == cell(va)  # orphan routed to nearest centroid
    # and it is reachable by search: one-probe query finds it
    q = emb.filter(F.col("vec_id") == passing[0])
    res = ivf_topk(
        q, assigned, cents, "vec_id", "vec_id", "embedding", "embedding",
        k=3, n_probe=1,
    ).collect()
    assert failing[0] in {r.neighbor_id for r in res}


def test_semdedup_n_lists_budget_rule():
    """Executable form of SCALE.md's k ≈ corpus/target rule."""
    from capgemini_himss24_fhirbulkdata_demo_spark.operators.similarity import (
        semdedup_n_lists,
    )

    assert semdedup_n_lists(0) == 1
    assert semdedup_n_lists(999_999) == 1
    assert semdedup_n_lists(1_000_001) == 2
    assert semdedup_n_lists(50_000_000_000) == 50_000
    # shrinking the budget grows the cluster count
    assert semdedup_n_lists(10_000, target_cluster_rows=100) == 100
    assert semdedup_n_lists(10_000, target_cluster_rows=10) == 1000
    # broadcast ceiling clamps
    assert semdedup_n_lists(10**12, target_cluster_rows=1) == 1 << 16
    import pytest as _pytest

    with _pytest.raises(ValueError):
        semdedup_n_lists(-1)
    with _pytest.raises(ValueError):
        semdedup_n_lists(10, target_cluster_rows=0)


def test_semdedup_budget_path_matches_explicit(spark):
    """semdedup(corpus_rows=...) derives n_lists via the budget rule
    and must equal the explicitly-pinned run — x16's registered form
    is the n_lists=32 instance of the same operator."""
    from capgemini_himss24_fhirbulkdata_demo_spark.operators.similarity import (
        semdedup,
        semdedup_n_lists,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    n = emb.count()
    target = max(1, n // 20)  # force a multi-cluster derivation
    k = semdedup_n_lists(n, target_cluster_rows=target)
    a1, d1 = semdedup(emb, "vec_id", "embedding", threshold=0.95,
                      corpus_rows=n, target_cluster_rows=target, dim=64)
    a2, d2 = semdedup(emb, "vec_id", "embedding", threshold=0.95,
                      n_lists=k, dim=64)
    assert sorted((r.vec_id, r.cluster) for r in a1.collect()) == sorted(
        (r.vec_id, r.cluster) for r in a2.collect()
    )
    assert sorted(map(tuple, d1.collect())) == sorted(map(tuple, d2.collect()))
    # every vector stays assigned — no loss through the budget path
    assert a1.count() == n
    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_lists or corpus_rows"):
        semdedup(emb, "vec_id", "embedding", threshold=0.9)


def test_persisting_queries_attach_cached_deps(spark):
    """No-leak discipline: every query that persists an intermediate
    must hand it back via _cached_deps so sweeps can release it.
    Guard: running each known-persisting query and releasing its deps
    leaves the session's cached-RDD count unchanged (delta, not
    absolute zero — other tests in the shared session may hold their
    own caches)."""
    from capgemini_himss24_fhirbulkdata_demo_spark.queries import QUERIES

    jsc = spark.sparkContext._jsc.sc()
    baseline = jsc.getPersistentRDDs().size()
    for name in (
        "x02_dedup_minhash",
        "x05_simhash_pairs",
        "x06_dedup_embedding",
        "x08_sketch_accuracy",
        "x16_semdedup",
        "x58_containment_pairs",
    ):
        df = QUERIES[name](spark, SF_DIR)
        df.limit(1).collect()
        deps = getattr(df, "_cached_deps", [])
        assert deps, f"{name} persists but attaches no _cached_deps"
        for dep in deps:
            dep.unpersist(blocking=True)
    assert jsc.getPersistentRDDs().size() <= baseline


def test_x46_short_docs_no_crash(spark, tmp_path):
    """1-token and empty docs must not crash x46's bigram transform:
    ``sequence(1, 0)`` counts DOWN to [1, 0] and ``element_at(t, 0)``
    throws INVALID_INDEX_OF_ZERO unless gated (ADVICE r3). Short docs
    simply contribute no bigrams, matching the DuckDB oracle's
    end-exclusive RANGE semantics."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from capgemini_himss24_fhirbulkdata_demo_spark.queries import QUERIES

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["solo", "", "two tokens here"], pa.string()),
            "lang": pa.array(["en"] * 3, pa.string()),
            "source": pa.array(["t"] * 3, pa.string()),
            "n_chars": pa.array([4, 0, 15], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r
        for r in QUERIES["x46_lm_score"](spark, str(tmp_path)).collect()
    }
    assert 1 not in out and 2 not in out  # no bigrams -> no scored rows
    assert out[3]["n_bigrams"] == 2


def test_x74_hll_rollup_close_to_exact(spark):
    """The re-aggregated (nation→region) HLL estimate must sit within
    HLL_4/lgK=12 error (<2% at these cardinalities) of the exact
    distinct count — proving sketch partials survive the union step —
    and the in-query exact twin must equal an independently computed
    exact count. The query itself only emits the ±5% hll_ok gate
    (invariant form, r7), so this test REBUILDS the raw estimate via
    the same nation-sketch→region union to keep the tight 2%
    regression guard the pre-r7 schema carried."""
    from capgemini_himss24_fhirbulkdata_demo_spark.catalog import load_table
    from capgemini_himss24_fhirbulkdata_demo_spark.queries import QUERIES
    from pyspark.sql import functions as F

    rows = QUERIES["x74_hll_rollup"](spark, SF_DIR).collect()
    assert all(r.hll_ok is True for r in rows)
    got = {r.r_name: r.exact_customers for r in rows}

    orders = load_table(spark, SF_DIR, "orders")
    cust = load_table(spark, SF_DIR, "customer")
    nation = load_table(spark, SF_DIR, "nation")
    region = load_table(spark, SF_DIR, "region")
    joined = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
    )
    exact = {
        r.r_name: r.n
        for r in joined.groupBy("r_name")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(got) == set(exact) and len(got) > 0
    for k, n in got.items():
        assert n == exact[k], (k, n, exact[k])

    # raw estimate, same two-level rollup the query runs (lgConfigK=14
    # since the r9 recalibration): nation sketches unioned to region
    # grain — within 2% of exact
    est = {
        r.r_name: r.est
        for r in joined.groupBy("r_name", "n_name")
        .agg(F.hll_sketch_agg("o_custkey", 14).alias("sk"))
        .groupBy("r_name")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()
    }
    for k, e in est.items():
        assert abs(e - exact[k]) <= max(2, 0.02 * exact[k]), (k, e, exact[k])


def test_x86_storage_audit_matches_duckdb_metadata(spark):
    """The footer-read storage audit must agree byte-for-byte with
    DuckDB's parquet_metadata() over the same files — the cross-check
    the driver's data-view oracle can't express (needs file paths)."""
    import glob
    import os

    import duckdb

    from capgemini_himss24_fhirbulkdata_demo_spark.queries import QUERIES

    got = {
        r.column: (r.n_chunks, r.compressed_bytes, r.uncompressed_bytes)
        for r in QUERIES["x86_parquet_storage_audit"](spark, SF_DIR).collect()
    }
    base = os.path.join(SF_DIR, "lineitem.parquet")
    files = sorted(glob.glob(os.path.join(base, "*.parquet"))) or [base]
    con = duckdb.connect()
    exp = {}
    for p in files:
        for col, comp, unc, n in con.execute(
            """SELECT path_in_schema, SUM(total_compressed_size),
                      SUM(total_uncompressed_size), COUNT(*)
               FROM parquet_metadata(?) GROUP BY path_in_schema""",
            [p],
        ).fetchall():
            a = exp.setdefault(col, [0, 0, 0])
            a[0] += n
            a[1] += comp
            a[2] += unc
    assert got == {k: tuple(v) for k, v in exp.items()}
    assert len(got) == 11  # every lineitem column audited


def test_x97_cms_never_underestimates(spark):
    """CMS point estimates are provably >= true counts (collisions
    only ADD mass) — the invariant the overcount column rests on."""
    from capgemini_himss24_fhirbulkdata_demo_spark.queries import QUERIES

    rows = QUERIES["x97_cms_heavy_hitters"](spark, SF_DIR).collect()
    assert rows, "expected heavy hitters"
    for r in rows:
        assert r["cms_est"] >= r["true_cnt"], r
        assert r["overcount"] == r["cms_est"] - r["true_cnt"], r


def test_x95_x96_pq_invariants(spark):
    """PQ codes stay in [0, K); ADC distances are non-negative and
    each query returns exactly top-k ranked 1..k."""
    from capgemini_himss24_fhirbulkdata_demo_spark.queries import QUERIES
    from capgemini_himss24_fhirbulkdata_demo_spark.queries.similarity import (
        _PQ_NPLANES,
        _TOP_K,
    )

    k = 1 << _PQ_NPLANES
    for r in QUERIES["x95_pq_codes"](spark, SF_DIR).collect():
        for s in range(4):
            assert 0 <= r[f"c{s}"] < k, r
        assert r["pq_mse"] >= 0, r
    for name in ("x96_pq_adc_search", "x105_ivfpq_search"):
        per_q = {}
        for r in QUERIES[name](spark, SF_DIR).collect():
            assert r["adc_d2"] >= 0, (name, r)
            per_q.setdefault(r["q_id"], []).append(r["rnk"])
        for q_id, rnks in per_q.items():
            assert sorted(rnks) == list(range(1, _TOP_K + 1)), (name, q_id, rnks)


def test_x99_recall_bounded(spark):
    from capgemini_himss24_fhirbulkdata_demo_spark.queries import QUERIES
    from capgemini_himss24_fhirbulkdata_demo_spark.queries.similarity import (
        _TOP_K,
    )

    rows = QUERIES["x99_matryoshka_recall"](spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r["n_hit"] <= _TOP_K, r
        assert 0.0 <= r["recall"] <= 1.0, r


def test_x100_pagerank_mass_conservation(spark):
    """Fixed-point PageRank: every node keeps positive rank (the
    teleport term guarantees it) and total mass never exceeds the
    scale (integer floors + dangling drop only LOSE mass); the
    teleport floor alone is 15% of scale."""
    from capgemini_himss24_fhirbulkdata_demo_spark.queries import QUERIES
    from capgemini_himss24_fhirbulkdata_demo_spark.queries.graph import (
        _PR_SCALE,
    )

    rows = QUERIES["x100_pagerank_nations"](spark, SF_DIR).collect()
    assert len(rows) == 25
    total = sum(r["pr_fixed"] for r in rows)
    assert 0 < total <= _PR_SCALE, total
    assert total >= _PR_SCALE * 15 // 100, total
    for r in rows:
        assert r["pr_fixed"] > 0, r


def test_x101_cohort_matrix_invariants(spark):
    from capgemini_himss24_fhirbulkdata_demo_spark.queries import QUERIES

    rows = QUERIES["x101_cohort_retention"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["week_offset"] >= 0, r
        assert 0 < r["n_active"] <= r["cohort_size"], r
        assert 0.0 < r["retention"] <= 1.0, r
    # offset-0 cells cover the whole cohort by construction
    for r in rows:
        if r["week_offset"] == 0:
            assert r["n_active"] == r["cohort_size"], r


def test_x102_similarity_bounds(spark):
    from capgemini_himss24_fhirbulkdata_demo_spark.queries import QUERIES

    rows = QUERIES["x102_source_unigram_cosine"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 < r["cosine_to_corpus"] <= 1.0, r
        assert 0.0 <= r["gini_diversity"] < 1.0, r


def test_x104_estimate_within_bucket_width(spark):
    """Histogram quantile error is bounded by one bucket width: the
    exact rank statistic lives inside the interpolated bucket."""
    from capgemini_himss24_fhirbulkdata_demo_spark.queries import QUERIES
    from capgemini_himss24_fhirbulkdata_demo_spark.queries.features import (
        _X104_W,
    )

    rows = QUERIES["x104_histogram_quantiles"](spark, SF_DIR).collect()
    assert len(rows) == 3
    for r in rows:
        assert abs(r["est_value"] - r["exact_value"]) <= _X104_W, r


def test_bpe_train_matches_hand_computation(spark):
    """BPE merges on a tiny corpus match the hand-run Sennrich
    algorithm (max pair count, lexicographic ties), and encoding
    reproduces the training segmentation for in-dictionary words."""
    from capgemini_himss24_fhirbulkdata_demo_spark.operators.bpe import (
        _END,
        encode_bpe,
        train_bpe,
    )

    # "low" x5, "lower" x2, "newest" x6, "widest" x3 — the ACL'16
    # worked example family
    docs = spark.createDataFrame(
        [(0, "low " * 5), (1, "lower " * 2), (2, "newest " * 6),
         (3, "widest " * 3)],
        "doc_id LONG, text STRING",
    )
    merges = train_bpe(docs, "text", n_merges=10)
    # hand-run: pair counts round 1: ('e','s') 9, ('s','t') 9,
    # ('t','</w>') 9 ... lexicographic tie-break picks ('e','s')
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", _END)
    enc = encode_bpe(docs, "text", merges)
    rows = {r["doc_id"]: r["bpe_tokens"] for r in enc.collect()}
    newest = rows[2][: len(rows[2]) // 6]
    assert "".join(newest).replace(_END, "") == "newest"
    # token count shrinks as merges grow (compression property)
    few = encode_bpe(docs, "text", merges[:1])
    n_few = sum(len(r["bpe_tokens"]) for r in few.collect())
    n_all = sum(len(r["bpe_tokens"]) for r in enc.collect())
    assert n_all < n_few
    # determinism: retraining gives the identical merge list
    assert train_bpe(docs, "text", n_merges=10) == merges


def test_bpe_encode_distributed_consistency(spark):
    """Encoding is partition-layout-independent and concatenation of
    tokens reconstructs each document's words exactly (losslessness
    of the subword segmentation)."""
    from capgemini_himss24_fhirbulkdata_demo_spark.operators.bpe import (
        _END,
        encode_bpe,
        train_bpe,
    )

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text").limit(200)
    merges = train_bpe(docs, "text", n_merges=50, top_k=500)
    assert len(merges) == 50
    one = encode_bpe(docs.coalesce(1), "text", merges)
    many = encode_bpe(docs.repartition(8), "text", merges)
    a = {r["doc_id"]: r["bpe_tokens"] for r in one.collect()}
    b = {r["doc_id"]: r["bpe_tokens"] for r in many.collect()}
    assert a == b
    # lossless: joining tokens and stripping </w> restores the words
    for r in docs.limit(20).collect():
        toks = a[r["doc_id"]]
        rebuilt = "".join(toks).replace(_END, " ").split()
        assert rebuilt == str(r["text"]).split()


def test_bpe_wordpiece_scorer(spark):
    """The wordpiece scorer maximizes count(ab)/(count(a)·count(b))
    with exact-rational comparison: on a corpus where a rare pair is
    perfectly predictive ('q' only ever precedes 'z') it merges that
    pair before the merely-frequent one, while plain BPE does the
    opposite; both scorers retrain deterministically."""
    from capgemini_himss24_fhirbulkdata_demo_spark.operators.bpe import (
        train_bpe,
    )

    # 'ab' appears 20x but 'a'/'b' are everywhere (also alone);
    # 'qz' appears 3x and q/z appear ONLY there
    docs = spark.createDataFrame(
        [(0, "ab " * 20), (1, "aa bb " * 10), (2, "qz " * 3)],
        "doc_id LONG, text STRING",
    )
    bpe = train_bpe(docs, "text", n_merges=1, scorer="bpe")
    wp = train_bpe(docs, "text", n_merges=1, scorer="wordpiece")
    assert bpe != wp
    assert wp[0] in (("q", "z"), ("z", "</w>"))  # the predictive pair
    assert train_bpe(docs, "text", n_merges=1, scorer="wordpiece") == wp
    import pytest

    with pytest.raises(ValueError):
        train_bpe(docs, "text", 1, scorer="unigram")


def test_simhash64_pairs_match_brute_force(spark):
    """Pigeonhole exactness of the 64-bit banded pair search: on a
    small corpus the banded operator must return EXACTLY the pairs a
    brute-force all-pairs Hamming scan finds — banding may lose no
    recall, verification may admit no extras. (The 64-bit operator is
    the corpus-scale path of x05's 16-bit demonstrator; see the
    operator docstring for the collision-rate argument.)"""
    from capgemini_himss24_fhirbulkdata_demo_spark.operators.dedup import (
        release_cached_deps,
        simhash_pairs64,
        simhash_signatures64,
    )

    docs = load_table(spark, SF_DIR, "documents").limit(150)
    got_df = simhash_pairs64(docs, "doc_id", "text", hamming_max=3)
    got = {(r.id_a, r.id_b, r.hamming) for r in got_df.collect()}
    release_cached_deps(got_df)

    sigs = simhash_signatures64(docs, "doc_id", "text")
    a = sigs.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sh_a"))
    b = sigs.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("sh_b"))
    brute = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
            .cast("bigint")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
    )
    want = {(r.id_a, r.id_b, r.hamming) for r in brute.collect()}
    assert got == want


def test_simhash64_finds_planted_duplicate_and_respects_bounds(spark):
    """A byte-identical copy under a new id must surface at Hamming 0;
    every reported pair obeys id_a < id_b and hamming <= max; an
    indivisible band request raises."""
    import pytest as _pytest

    from capgemini_himss24_fhirbulkdata_demo_spark.operators.dedup import (
        release_cached_deps,
        simhash_pairs64,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").limit(60)
    max_id = docs.agg(F.max("doc_id")).first()[0]
    planted = docs.unionByName(
        docs.limit(1).select(
            (F.col("doc_id") + F.lit(max_id + 1)).alias("doc_id"), F.col("text")
        )
    )
    out = simhash_pairs64(planted, "doc_id", "text", hamming_max=3)
    rows = out.collect()
    release_cached_deps(out)
    orig = docs.limit(1).first().doc_id
    assert (orig, orig + max_id + 1, 0) in {
        (r.id_a, r.id_b, r.hamming) for r in rows
    }
    assert all(r.id_a < r.id_b and 0 <= r.hamming <= 3 for r in rows)

    with _pytest.raises(ValueError, match="equal bands"):
        simhash_pairs64(planted, "doc_id", "text", hamming_max=2)
