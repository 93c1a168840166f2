"""Extension operators for large-scale training-data pipelines.

Modules:
    common.py     — shared constants + tokenization used by Spark AND oracles
    text.py       — language-id, quality scoring (stats/entropy/unigram/
                    bigram LM; batch + stateless-streaming gate forms),
                    token counts, fingerprints, normalization, vocab,
                    heavy hitters (Misra-Gries + exact verify), chunking,
                    co-occurrence, BPE train/encode
    dedup.py      — exact, MinHash+LSH, SimHash, n-gram Jaccard near-dup,
                    connected components, span dedup, retention
    similarity.py — cosine top-k (brute force + IVF/LSH scale paths),
                    k-means, SemDeDup, int8 quantization, embedding gramian
    sampling.py   — deterministic splits, stratified + domain-mix sampling
    graph.py      — PageRank + label-propagation communities over
                    relational edge tables (fixed-budget trajectories)
    multimodal.py — binary-column plumbing with real WAV/BMP codecs
    registry.py   — SQL scalar UDFs + pandas UDF handlers
    quantiles.py  — exact distributed quantiles via mergeable summaries
                    (summarize → bound → exact select; no global sort)
    timeseries.py — canonical sequential LTTB downsampling (per-series
                    chains via applyInPandas, engine-exact floats)
"""
