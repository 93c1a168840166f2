"""Equivalence pins for the r16 optimization round.

Every optimization this round restructured an operator's PLAN while
keeping its values bit-identical (the oracle gate proves end-to-end
equality; these tests pin the specific internal equivalences so a future
refactor that breaks one fails HERE with a named kernel, not as a
mysterious oracle diff):

  * ``dot_w`` / the unrolled ts-similarity distance == the sequential
    fold (the 0.0 + x == x seed argument),
  * ``_pq_assign(keep_sv=True)`` == argmin + join-back-to-sub,
  * the star rounds without large-star's trailing distinct == the
    both-distinct reference form,
  * ``_ivf_assign_numpy(keep_vec=True)`` == assignment ⋈ corpus,
  * ex_pagerank's numeric node relabeling == the string-key trajectory.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from espkinesis_spark.functions import common as C
from espkinesis_spark.functions import dedup, similarity
from espkinesis_spark import queries as Q


def _sets_equal(a, b) -> bool:
    return a.exceptAll(b).union(b.exceptAll(a)).isEmpty()


def test_dot_w_matches_fold(spark):
    rows = [
        ([1.5, -2.25, 0.0, 4.0], [0.5, 3.0, -1.0, 2.0]),
        ([0.0, 0.0, 0.0, 0.0], [-1.0, -2.0, -3.0, -4.0]),  # -0.0 products
        ([1e-9, 1e9, -1e-9, 1e3], [1e9, 1e-9, 1e3, -1e-9]),
    ]
    df = spark.createDataFrame(rows, "a array<double>, b array<double>")
    out = df.select(
        similarity.dot(F.col("a"), F.col("b")).alias("fold"),
        similarity.dot_w(F.col("a"), F.col("b"), 4).alias("unrolled"),
    ).collect()
    for r in out:
        # bit-identical up to the ±0.0 sign (which every consumer
        # normalizes through a subtraction or a 0.0-seeded fold)
        assert r["fold"] == r["unrolled"]


def test_pq_assign_keep_sv_matches_joinback(spark, sf_dir):
    emb = Q._t(spark, sf_dir, "embeddings")
    sub = similarity._subvectors(emb, C.PQ_M).repartition(4, "vec_id", "m")
    cents = sub.filter(F.col("vec_id") < C.PQ_K).select(
        "m", F.col("vec_id").alias("centroid_id"), F.col("sv").alias("c")
    )
    fused = similarity._pq_assign(sub, cents, keep_sv=True, width=None)
    plain = similarity._pq_assign(sub, cents)
    joined_back = plain.join(sub, ["vec_id", "m"]).select(
        "vec_id", "m", "centroid_id", "sv"
    )
    assert _sets_equal(fused, joined_back)
    # and the static-width argmin picks identical codewords
    wide = similarity._pq_assign(sub, cents, keep_sv=True, width=4)
    assert _sets_equal(
        fused.select("vec_id", "m", "centroid_id"),
        wide.select("vec_id", "m", "centroid_id"),
    )


def test_star_rounds_no_large_distinct_matches_reference(spark):
    # a graph with chains, a star, duplicates-after-orientation and
    # isolated pairs — the shapes the alternation contracts differently
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (20, 21), (5, 1), (4, 5)],
        "u long, v long",
    )

    def large_ref(e):
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("__m"))
        return (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("__m").alias("v"))
            .distinct()
        )

    def small_ref(e):
        d = (
            e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        mins = d.groupBy("u").agg(F.min("v").alias("__m"))
        nbr = (
            d.join(mins, "u")
            .filter(F.col("v") != F.col("__m"))
            .select(F.col("v").alias("u"), F.col("__m").alias("v"))
        )
        own = mins.select("u", F.col("__m").alias("v"))
        return nbr.union(own).distinct()

    cur = dedup._small_star(dedup._large_star(edges))
    ref = small_ref(large_ref(edges))
    assert _sets_equal(cur, ref)


def test_dedup_clusters_window_form_components(spark):
    # chain 1-2-3-4-5, pair 10-11, triangle 20-21-22
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (20, 21), (21, 22), (20, 22)],
        "doc_a long, doc_b long",
    )
    got = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup.dedup_clusters(pairs).collect()
    }
    want = {(i, 1) for i in (1, 2, 3, 4, 5)} | {(10, 10), (11, 10)} | {
        (i, 20) for i in (20, 21, 22)
    }
    assert got == want


def test_ivf_assign_keep_vec_matches_joinback(spark, sf_dir):
    emb = Q._t(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") % C.IVF_CENTROID_MOD == 0)
    plain = similarity._ivf_assign_numpy(emb, cents)
    kept = similarity._ivf_assign_numpy(emb, cents, keep_vec=True)
    assert _sets_equal(
        kept.select("vec_id", "centroid_id"), plain.select("vec_id", "centroid_id")
    )
    # the passed-through vector is the original corpus vector
    back = kept.select("vec_id", "embedding")
    orig = emb.select("vec_id", "embedding")
    assert _sets_equal(back, orig)


def test_ts_similarity_scalar_scoring_matches_hof_reference(spark, sf_dir):
    from pyspark.sql import Window

    w = C.TSS_W
    ev = Q._t(spark, sf_dir, "events")
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, w - 1)
    )
    wins = ev.select(
        "user_id",
        F.col("event_id").alias("start_event_id"),
        F.collect_list("value").over(win).alias("arr"),
    ).filter(F.size("arr") == w)

    def znorm(arr):
        mean = F.aggregate(arr, F.lit(0.0), lambda a, x: a + x) / F.lit(float(w))
        ex2 = F.aggregate(arr, F.lit(0.0), lambda a, x: a + x * x) / F.lit(float(w))
        std = F.sqrt(F.greatest(ex2 - mean * mean, F.lit(0.0)))
        return F.when(std == 0.0, F.transform(arr, lambda x: F.lit(0.0))).otherwise(
            F.transform(arr, lambda x: (x - mean) / std)
        )

    q = (
        wins.filter(F.col("user_id") == C.TSS_QUERY_USER)
        .orderBy("start_event_id")
        .limit(1)
        .select(znorm(F.col("arr")).alias("qz"))
    )
    zw = wins.withColumn("zarr", znorm(F.col("arr")))
    dist = F.round(
        F.sqrt(
            F.aggregate(
                F.zip_with(F.col("zarr"), F.col("qz"), lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        ),
        6,
    )
    reference = (
        zw.crossJoin(F.broadcast(q))
        .select("user_id", "start_event_id", dist.alias("dist"))
        .orderBy("dist", "user_id", "start_event_id")
        .limit(C.TSS_TOPK)
    )
    current = Q.ex_ts_similarity(spark, sf_dir)
    assert reference.toPandas().equals(current.toPandas())


def test_pagerank_numeric_relabel_matches_string_trajectory(spark, sf_dir):
    from espkinesis_spark.functions import graph

    orders = Q._t(spark, sf_dir, "orders")
    li = Q._t(spark, sf_dir, "lineitem")
    string_edges = orders.join(li, orders["o_orderkey"] == li["l_orderkey"]).select(
        F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
    )
    reference = graph.pagerank(string_edges)
    current = Q.ex_pagerank(spark, sf_dir)
    assert _sets_equal(reference, current)
