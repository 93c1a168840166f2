"""Extension operators for large-scale training-data pipelines.

Modules:
    common.py     — shared constants + tokenization used by Spark AND oracles
    text.py       — language-id, quality scoring, token counts, fingerprints
    dedup.py      — exact, MinHash+LSH, SimHash, n-gram Jaccard near-dup
    similarity.py — cosine top-k (brute force + IVF scale path)
    multimodal.py — binary-column plumbing with stubbed decoders
"""
