"""Kernel-vs-expression equivalence: every operator with a numpy default
and a SQL fallback must produce identical results on adversarial inputs."""

from __future__ import annotations

import random
import string

import pytest
from pyspark.sql import functions as F

from espkinesis_spark.functions import dedup, similarity, text
from espkinesis_spark.tables import load_table

random.seed(42)


def _random_docs(spark, n=60):
    def doc(i):
        words = [
            "".join(random.choices(string.ascii_lowercase + string.digits, k=random.randint(1, 8)))
            for _ in range(random.randint(1, 40))
        ]
        # inject repeated tokens, punctuation, and odd whitespace
        if i % 3 == 0:
            words += words[:3]
        txt = (" " * (i % 3 + 1)).join(words)
        if i % 4 == 0:
            txt = "  " + txt + " !?. "
        return (i, txt)

    return spark.createDataFrame([doc(i) for i in range(n)], "doc_id long, text string")


def test_simhash_kernel_equals_sql(spark):
    docs = _random_docs(spark)
    a = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs, impl="numpy").collect()}
    b = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs, impl="sql").collect()}
    assert a == b


def test_fingerprints_kernel_equals_sql(spark):
    docs = _random_docs(spark)
    a = {r["doc_id"]: (r["fp_key"], r["fp_roll"]) for r in text.fingerprints(docs, impl="numpy").collect()}
    b = {r["doc_id"]: (r["fp_key"], r["fp_roll"]) for r in text.fingerprints(docs, impl="sql").collect()}
    assert a == b


def test_lang_id_kernel_equals_sql(spark):
    docs = _random_docs(spark)
    # mix in real stopwords so every language branch fires
    extra = spark.createDataFrame(
        [
            (1000, "the cat of the house and a dog"),
            (1001, "el que la casa y un perro en"),
            (1002, "der hund und die katze ist ein"),
            (1003, "le chat est une maison du les"),
            (1004, "zzz qqq www"),
            (1005, "the el der le"),  # cross-language tie -> en priority
        ],
        "doc_id long, text string",
    )
    docs = docs.unionByName(extra)
    a = {r["doc_id"]: r["lang_pred"] for r in text.lang_id(docs, impl="numpy").collect()}
    b = {r["doc_id"]: r["lang_pred"] for r in text.lang_id(docs, impl="sql").collect()}
    assert a == b


def test_neardup_cosine_kernel_equals_sql(spark, sf_dir):
    vecs = load_table(spark, sf_dir, "embeddings")
    a = {(r["vec_a"], r["vec_b"], r["cos"]) for r in similarity.neardup_cosine(vecs, impl="numpy").collect()}
    b = {(r["vec_a"], r["vec_b"], r["cos"]) for r in similarity.neardup_cosine(vecs, impl="sql").collect()}
    assert a == b and len(a) > 0


def test_topk_kernel_equals_sql(spark, sf_dir):
    vecs = load_table(spark, sf_dir, "embeddings")
    q = vecs.filter(F.col("vec_id") < 10)
    a = [tuple(r) for r in similarity.topk_bruteforce(q, vecs, k=4, impl="numpy").orderBy("vec_id", "rnk").collect()]
    b = [tuple(r) for r in similarity.topk_bruteforce(q, vecs, k=4, impl="sql").orderBy("vec_id", "rnk").collect()]
    assert a == b and len(a) > 0


def test_ivf_assign_kernel_equals_sql(spark, sf_dir):
    vecs = load_table(spark, sf_dir, "embeddings")
    cents = vecs.filter(F.col("vec_id") % 25 == 0)
    a = {(r["vec_id"], r["centroid_id"]) for r in similarity.ivf_assign(vecs, cents, impl="numpy").collect()}
    b = {(r["vec_id"], r["centroid_id"]) for r in similarity.ivf_assign(vecs, cents, impl="sql").collect()}
    assert a == b
