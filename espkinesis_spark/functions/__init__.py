"""Extension operators for large-scale training-data pipelines.

Modules:
    common.py     — shared constants + tokenization used by Spark AND oracles
    text.py       — language-id, quality scoring (stats/entropy/unigram/
                    bigram LM), token counts, fingerprints, normalization,
                    vocab, chunking, co-occurrence, BPE train/encode
    dedup.py      — exact, MinHash+LSH, SimHash, n-gram Jaccard near-dup,
                    connected components, span dedup, retention
    similarity.py — cosine top-k (brute force + IVF/LSH scale paths),
                    k-means, SemDeDup, int8 quantization, embedding gramian
    sampling.py   — deterministic splits, stratified + domain-mix sampling
    graph.py      — PageRank over relational edge tables
    multimodal.py — binary-column plumbing with real WAV/BMP codecs
    registry.py   — SQL scalar UDFs + pandas UDF handlers
"""
