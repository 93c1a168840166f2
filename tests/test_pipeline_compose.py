"""End-to-end composition: the LLM-data-pipeline ops chained the way a
real curation pipeline runs them — quality gate → near-dup removal →
chunking → tokenizer stats — asserting the set-algebra invariants that
must hold between stages (each stage only narrows, ids stay consistent,
downstream ops run on upstream output without schema friction)."""

from __future__ import annotations

from pyspark.sql import functions as F

from espkinesis_spark.functions import dedup, text
from espkinesis_spark.tables import load_table


def test_quality_dedup_chunk_chain(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()

    gated = docs.join(
        text.quality_filter(docs).filter(F.col("keep")).select("doc_id"), "doc_id"
    )
    n_gated = gated.count()
    assert 0 < n_gated <= n_docs

    survivors = dedup.dedup_apply(gated)
    n_surv = survivors.count()
    assert 0 < n_surv <= n_gated
    # survivors are a subset of the gated corpus, text intact
    assert survivors.join(gated, ["doc_id", "text"]).count() == n_surv

    chunks = text.chunk_docs(survivors)
    chunk_docs_ids = {r["doc_id"] for r in chunks.select("doc_id").distinct().collect()}
    surv_ids = {r["doc_id"] for r in survivors.select("doc_id").collect()}
    assert chunk_docs_ids == surv_ids  # every surviving doc chunked, no ghosts

    counts = text.token_counts(survivors)
    assert counts.count() == n_surv
    assert counts.filter(F.col("ws_tokens") <= 0).count() == 0


def test_normalize_feeds_exact_dedup(spark):
    """Normalization-then-hash collapses case/spacing/accent variants that
    raw exact dedup would miss — the reason the normalize stage exists."""
    docs = spark.createDataFrame(
        [
            (1, "Hello  World"),
            (2, "hello world"),      # same after normalization
            (3, "héllo wórld"),      # accent-folded duplicate
            (4, "different text"),
        ],
        "doc_id long, text string",
    )
    norm = text.normalize_text(docs)
    groups = norm.groupBy("norm_md5").agg(
        F.count("*").alias("n"), F.min("doc_id").alias("keep_id")
    )
    assert {(r["n"], r["keep_id"]) for r in groups.collect()} == {(3, 1), (1, 4)}
    # raw exact dedup (no normalization) sees four distinct texts
    assert dedup.exact_dedup_groups(docs).count() == 4
