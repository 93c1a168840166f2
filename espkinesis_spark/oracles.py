"""DuckDB oracle SQL for every declared query (driver correctness gate).

Shared-semantics discipline:
  * every hash bottoms out in md5 (identical in both engines);
  * tokenizer/shingle/threshold constants come from functions/common.py;
  * float aggregates are ROUNDed (4 dp; money 2 dp) in BOTH engines;
  * SUM over integers is CAST to BIGINT (DuckDB widens to HUGEINT);
  * timestamps are CAST to TIMESTAMP (µs) — the parquet is ns, Spark reads µs;
  * cosine = dot / (||a||·||b||) in double, rounded to 6 dp before any
    argmax/threshold, ties to the lowest neighbor id.
"""

from __future__ import annotations

from espkinesis_spark.functions import common as C

# -- shared fragments --------------------------------------------------------

_TOKS = "string_split_regex(trim({t}), '\\s+')"

# distinct word 3-shingles per doc (mirror of dedup.shingles)
_SHINGLES = f"""
toks AS (SELECT doc_id, {_TOKS.format(t='text')} AS t FROM documents),
sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+{C.SHINGLE_WORDS - 1}], ' ') AS s
       FROM toks, UNNEST(range(1, greatest(len(t) - {C.SHINGLE_WORDS - 2}, 2))) AS u(i))
"""


def _cents_o(expr: str) -> str:
    """Sign-aware half-away 2-dp fixed point — the IDENTICAL expression
    text queries._cents_sql emits on the Spark side."""
    return (
        f"CAST(CASE WHEN ({expr}) >= 0"
        f" THEN floor(({expr}) * 100 + 0.5)"
        f" ELSE -floor(-(({expr})) * 100 + 0.5) END AS BIGINT)"
    )


def _cos(a: str, b: str) -> str:
    return (
        f"round(list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), {C.COSINE_ROUND})"
    )


_EXACT_JACCARD = f"""
WITH {_SHINGLES},
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
j AS (SELECT da, db, round(i * 1.0 / (sa.n + sb.n - i), 6) AS jac
      FROM inter JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db)
SELECT da AS doc_a, db AS doc_b, jac AS jaccard
FROM j WHERE jac >= {C.JACCARD_THRESHOLD}
"""

# add-alpha bigram LM over the corpus (mirror of text.bigram_logprob):
# bigram fan-out, LM counts, context marginals, vocab size, smoothed probs —
# shared by ex_bigram_logprob and the CCNet tercile cut on top of it
_BIGRAM_CTES = f"""t AS (SELECT doc_id, {_TOKS.format(t='text')} AS t FROM documents),
        bg AS (SELECT doc_id, t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2
               FROM t, UNNEST(range(1, len(t))) u(i)
               WHERE length(t[CAST(i AS INT)]) > 0
                 AND length(t[CAST(i AS INT) + 1]) > 0),
        lm AS (SELECT w1, w2, CAST(count(*) AS DOUBLE) AS c12 FROM bg GROUP BY 1, 2),
        ctx AS (SELECT w1, CAST(count(*) AS DOUBLE) AS c1 FROM bg GROUP BY 1),
        vv AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM (
               SELECT DISTINCT w FROM (
                 SELECT unnest({_TOKS.format(t='text')}) AS w FROM documents)
               WHERE length(w) > 0)),
        pr AS (SELECT lm.w1, lm.w2,
                      (lm.c12 + {C.BIGRAM_ALPHA}) / (ctx.c1 + {C.BIGRAM_ALPHA} * vv.v) AS p
               FROM lm JOIN ctx ON ctx.w1 = lm.w1 CROSS JOIN vv)"""


def _knn_edge_ctes() -> str:
    """The directed-top-k kNN candidate chain (through the ``e2`` CTE:
    per-vector top-K by cosine over the 8-bit sign-bucket multiprobe
    candidates) — the ONE copy shared by the graph, cluster, and
    dedup-apply oracles (the _BIGRAM_CTES discipline: a change to the
    probe set or degree cap edits exactly one fragment)."""
    bucket = " + ".join(
        f"(CASE WHEN e[{i + 1}] > 0 THEN {2**i} ELSE 0 END)" for i in range(8)
    )
    probes = ", ".join(f"xor(bucket, {2**i})" for i in range(8))
    return f"""v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
b AS (SELECT vec_id, e, CAST({bucket} AS BIGINT) AS bucket FROM v),
pr AS (SELECT vec_id, e, unnest([bucket, {probes}]) AS pb FROM b),
sc AS (SELECT a.vec_id AS src, n.vec_id AS dst, {_cos('a.e', 'n.e')} AS cos
       FROM pr a JOIN b n ON a.pb = n.bucket AND a.vec_id <> n.vec_id),
kn AS (SELECT src, dst, cos,
              row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rnk
       FROM sc),
e2 AS (SELECT src, dst, cos FROM kn WHERE rnk <= {C.KNN_GRAPH_K})"""


def _knn_graph_sql() -> str:
    """Mutual-edge symmetrization over the shared candidate chain."""
    return f"""
WITH {_knn_edge_ctes()}
SELECT a.src, a.dst, a.cos
FROM e2 a JOIN e2 r ON a.src = r.dst AND a.dst = r.src
WHERE a.src < a.dst"""


def _knn_cc_ctes() -> str:
    """The shared mutual-kNN edge + recursive-reach CC chain (through the
    ``cc`` CTE) — consumed by the cluster report and the dedup apply."""
    return f"""
WITH RECURSIVE {_knn_edge_ctes()},
m AS (SELECT a.src, a.dst FROM e2 a JOIN e2 r ON a.src = r.dst AND a.dst = r.src
      WHERE a.src < a.dst AND a.cos >= {C.KNN_CLUSTER_MIN_COS}),
edges AS (SELECT src AS u, dst AS w FROM m UNION ALL SELECT dst, src FROM m),
reach(node, r) AS (
    SELECT u, u FROM edges
    UNION
    SELECT eg.u, rr.r FROM edges eg JOIN reach rr ON rr.node = eg.w
),
cc AS (SELECT node, CAST(min(r) AS BIGINT) AS cluster_id FROM reach GROUP BY node)"""


def _knn_clusters_sql() -> str:
    """Cluster report: per-node label + per-cluster size decoration."""
    return f"""{_knn_cc_ctes()},
sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
       FROM cc GROUP BY cluster_id)
SELECT cc.node AS vec_id, cc.cluster_id, sz.cluster_size
FROM cc JOIN sz USING (cluster_id)"""


def _knn_dedup_apply_sql() -> str:
    """Dedup apply: keep each cluster's min-id representative, drop every
    other member, summarize survivors per label."""
    return f"""{_knn_cc_ctes()}
SELECT label, CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(vec_id) AS BIGINT) AS sum_ids
FROM embeddings
WHERE vec_id NOT IN (SELECT node FROM cc WHERE node <> cluster_id)
GROUP BY label"""


def _zorder_layout_sql(modular_time: bool) -> str:
    """``modular_time=False``: the batch 64-bucket LOCALITY report (both
    axes range-quantized over min/max, buckets = the z-value's TOP bits,
    per-bucket extents). ``modular_time=True``: the streaming SHARD
    report (modular grids — no corpus bounds in an endless stream;
    shards = the z-value's LOW bits, which vary fastest and spread
    uniformly — the top-bits form degenerates when an axis undershoots
    the modular grid, the batch entry's pmod lesson)."""
    from espkinesis_spark.functions import layout

    grid = 1 << C.ZORDER_BITS
    zsql = layout.z_value_sql("uq", "tq")
    events_ms = """e AS (SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS t_ms
                   FROM events)"""
    if modular_time:
        shards = 1 << C.ZORDER_REPORT_BITS
        return f"""
        WITH {events_ms},
        q AS (SELECT user_id, t_ms, user_id % {grid} AS uq,
              (t_ms // 1000) % {grid} AS tq FROM e),
        z AS (SELECT user_id, t_ms, {zsql} AS zv FROM q)
        SELECT zv % {shards} AS zshard, CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM z GROUP BY zv % {shards}"""
    shift = 2 * C.ZORDER_BITS - C.ZORDER_REPORT_BITS
    return f"""
        WITH {events_ms},
        bd AS (SELECT min(t_ms) AS mn, max(t_ms) AS mx,
                   min(user_id) AS umn, max(user_id) AS umx FROM e),
        q AS (SELECT user_id, t_ms,
              least(((t_ms - mn) * {grid}) // (mx - mn + 1), {grid - 1}) AS tq,
              least(((user_id - umn) * {grid}) // (umx - umn + 1), {grid - 1}) AS uq
              FROM e, bd),
        z AS (SELECT user_id, t_ms, {zsql} AS zv FROM q)
        SELECT zv >> {shift} AS zbucket, CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(max(user_id) - min(user_id) AS BIGINT) AS u_span,
               CAST(max(t_ms) - min(t_ms) AS BIGINT) AS t_span_ms
        FROM z GROUP BY zv >> {shift}"""


_STOP = {lg: "[" + ", ".join(f"'{w}'" for w in ws) + "]" for lg, ws in C.LANG_STOPWORDS.items()}

_TEXT_STATS_BASE = f"""
WITH t AS (SELECT doc_id, text, {_TOKS.format(t='text')} AS toks FROM documents),
s AS (SELECT doc_id,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  round(list_reduce(list_prepend(CAST(0 AS BIGINT),
        list_transform(toks, x -> CAST(length(x) AS BIGINT))), (a, b) -> a + b)
        * 1.0 / len(toks), 4) AS avg_token_len,
  round(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) * 1.0 / length(text), 4) AS punct_ratio,
  round(len(list_filter(toks, x -> list_contains({_STOP['en']}, x))) * 1.0 / len(toks), 4) AS stopword_ratio
FROM t)
"""


def _minhash_sig_sql(k: int = 8) -> str:
    aggs = ",\n  ".join(
        f"min(({C.MINHASH_A[j]} * h + {C.MINHASH_B[j]}) % {C.MINHASH_P}) AS sig{j:02d}"
        for j in range(k)
    )
    return (
        f"WITH {_SHINGLES},\n"
        f"hh AS (SELECT doc_id, CAST(concat('0x', substring(md5(s), 1, 15)) AS BIGINT)"
        f" % {C.MINHASH_P} AS h FROM sh)\n"
        f"SELECT doc_id, {aggs} FROM hh GROUP BY doc_id"
    )


def _ann_ivf_sql() -> str:
    cos_xc = _cos("x.e", "c.e")
    cos_qc = _cos("q.e", "c.e")
    cos_qn = _cos("q.e", "n.e")
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
cent AS (SELECT vec_id AS centroid_id, e FROM v WHERE vec_id % {C.IVF_CENTROID_MOD} = 0),
assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT x.vec_id, c.centroid_id,
           row_number() OVER (PARTITION BY x.vec_id ORDER BY {cos_xc} DESC, c.centroid_id) AS rn
    FROM v x CROSS JOIN cent c) WHERE rn = 1),
probes AS (
  SELECT vec_id, centroid_id FROM (
    SELECT q.vec_id, c.centroid_id,
           row_number() OVER (PARTITION BY q.vec_id ORDER BY {cos_qc} DESC, c.centroid_id) AS rn
    FROM v q CROSS JOIN cent c WHERE q.vec_id < {C.ANN_QUERY_MAX_ID}) WHERE rn <= {C.IVF_NPROBE}),
cand AS (SELECT p.vec_id, a.vec_id AS neighbor_id
         FROM probes p JOIN assign a ON a.centroid_id = p.centroid_id
         WHERE p.vec_id <> a.vec_id),
scored AS (SELECT cand.vec_id, cand.neighbor_id, {cos_qn} AS cos
           FROM cand JOIN v q ON q.vec_id = cand.vec_id
                     JOIN v n ON n.vec_id = cand.neighbor_id)
SELECT vec_id, rnk, neighbor_id FROM (
  SELECT vec_id, neighbor_id,
         row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rnk
  FROM scored) WHERE rnk <= {C.IVF_TOPK}
"""


def _kmeans_assign_cte(cent: str, name: str) -> str:
    return f"""{name} AS (SELECT vec_id, centroid_id FROM (
    SELECT x.vec_id, c.centroid_id,
           row_number() OVER (PARTITION BY x.vec_id
                              ORDER BY {_cos('x.e', 'c.c')} DESC, c.centroid_id) AS rn
    FROM v x CROSS JOIN {cent} c) WHERE rn = 1)"""


def _kmeans_ctes() -> tuple[list[str], str]:
    """CTE chain replaying kmeans_train's exact trajectory: same init
    (vec_id < k), same rounded-cosine argmin assignment (ties to lowest
    centroid id), same 6-dp-rounded per-dim mean update, for KMEANS_ITERS
    rounds. Returns (parts, name-of-final-centroid-CTE)."""
    k, iters = C.KMEANS_K, C.KMEANS_ITERS

    def update(a: str, name: str) -> str:
        return f"""{name} AS (SELECT centroid_id, array_agg(round(m, 6) ORDER BY dim) AS c FROM (
    SELECT {a}.centroid_id, CAST(i AS INT) AS dim,
           avg(e[CAST(i AS INT) + 1]) AS m
    FROM {a} JOIN v USING (vec_id), UNNEST(range(len(e))) AS t(i)
    GROUP BY 1, 2) GROUP BY 1)"""

    parts = [
        "v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)",
        f"c0 AS (SELECT vec_id AS centroid_id, e AS c FROM v WHERE vec_id < {k})",
    ]
    cur = "c0"
    for i in range(1, iters + 1):
        parts.append(_kmeans_assign_cte(cur, f"a{i}"))
        parts.append(update(f"a{i}", f"c{i}"))
        cur = f"c{i}"
    return parts, cur


def _bpe_ctes() -> tuple[list[str], int]:
    """CTE chain replaying text.bpe_train's exact greedy trajectory.

    Symbol sequences live in a delimited string — every symbol wrapped in
    single spaces, so adjacent symbols abut as '  ': word 'abc' becomes
    ' a  b  c '. Merging pair (a, b) is then a literal
    replace(' a  b ', ' ab '), which DuckDB applies leftmost-first and
    non-overlapping while the wrapping keeps a just-merged token from
    re-matching — byte-identical semantics to the Spark array fold. The
    s{r} CTEs carry (w, sym, freq) so _bpe_encode_sql can join the final
    segmentation back to words; b{r} holds round r's winning pair. The
    merge application LEFT-joins b{r} so a dry round (no pairs left —
    Spark's early break) passes sym through unchanged instead of
    emptying the chain. Returns (parts, rounds)."""
    rounds = C.BPE_MERGES
    parts = [
        f"tok AS (SELECT unnest({_TOKS.format(t='text')}) AS w FROM documents)",
        "words AS (SELECT w, count(*) AS freq FROM tok WHERE len(w) > 0 GROUP BY w)",
        r"s1 AS (SELECT w, regexp_replace(w, '(.)', ' \1 ', 'g') AS sym, freq FROM words)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""p{r} AS (
  SELECT u.a, u.b, sum(u.freq) AS cnt FROM (
    SELECT x.freq, x.toks[CAST(i AS INT)] AS a, x.toks[CAST(i AS INT) + 1] AS b
    FROM (SELECT freq, string_split(trim(sym), '  ') AS toks FROM s{r}) x,
         UNNEST(range(1, len(x.toks))) AS t(i)) u
  GROUP BY 1, 2)"""
        )
        parts.append(
            f"b{r} AS (SELECT a, b, cnt FROM p{r} ORDER BY cnt DESC, a, b LIMIT 1)"
        )
        parts.append(
            f"""s{r + 1} AS (SELECT w,
  CASE WHEN bb.a IS NULL THEN sym
       ELSE replace(sym, ' ' || bb.a || '  ' || bb.b || ' ',
                    ' ' || bb.a || bb.b || ' ') END AS sym, freq
  FROM s{r} LEFT JOIN b{r} bb ON TRUE)"""
        )
    return parts, rounds


def _bpe_sql() -> str:
    parts, rounds = _bpe_ctes()
    finals = "\nUNION ALL ".join(
        f"SELECT CAST({r} AS INT) AS merge_rank, a AS lhs, b AS rhs,"
        f" CAST(cnt AS BIGINT) AS pair_count FROM b{r}"
        for r in range(1, rounds + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + finals


def _bpe_apply_ctes() -> list[str]:
    """The trained-merge chain + the TWO fragments every encode-side
    oracle shares (the _knn_edge_ctes one-copy discipline): ``final``
    (per-word subword count under the two-space segmentation
    convention) and ``docw`` (the exploded corpus)."""
    parts, rounds = _bpe_ctes()
    parts.append(
        f"""final AS (SELECT w,
  CAST(len(string_split(trim(sym), '  ')) AS BIGINT) AS n_sub
  FROM s{rounds + 1})"""
    )
    parts.append(
        f"""docw AS (SELECT doc_id, unnest({_TOKS.format(t='text')}) AS w
  FROM documents)"""
    )
    return parts


def _bpe_encode_sql() -> str:
    """Per-doc tokenization under the trained merges: join the final
    per-word segmentation back to the exploded corpus."""
    return (
        "WITH "
        + ",\n".join(_bpe_apply_ctes())
        + """
SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(f.n_sub) AS BIGINT) AS n_subwords,
       round(sum(len(d.w)) * 1.0 / sum(f.n_sub), 4) AS chars_per_subword
FROM docw d JOIN final f USING (w)
WHERE len(d.w) > 0 GROUP BY d.doc_id"""
    )


def _bpe_fertility_sql() -> str:
    """Per-language fertility over the shared trained-merge chain: the
    per-doc encode aggregate re-grouped by the language dimension."""
    parts = _bpe_apply_ctes()
    parts.append(
        """per AS (SELECT d.doc_id, count(*) AS n_words, sum(f.n_sub) AS n_sub
  FROM docw d JOIN final f USING (w)
  WHERE len(d.w) > 0 GROUP BY d.doc_id)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + """
SELECT l.lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(per.n_words) AS BIGINT) AS n_words,
       CAST(sum(per.n_sub) AS BIGINT) AS n_subwords,
       round(sum(per.n_sub) * 1.0 / sum(per.n_words), 4) AS fertility
FROM per JOIN documents l USING (doc_id) GROUP BY l.lang"""
    )


def _kmeans_sql() -> str:
    parts, cur = _kmeans_ctes()
    parts.append(_kmeans_assign_cte(cur, "af"))
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT c.centroid_id, CAST(coalesce(s.n, 0) AS BIGINT) AS n,
       round(sqrt(list_dot_product(c.c, c.c)), 6) AS centroid_norm,
       CAST(i AS INT) AS dim, round(c.c[CAST(i AS INT) + 1], 6) AS x
FROM {cur} c LEFT JOIN (SELECT centroid_id, count(*) AS n FROM af GROUP BY 1) s
     ON c.centroid_id = s.centroid_id, UNNEST(range(len(c.c))) AS t(i)"""
    )


def _semdedup_sql() -> str:
    """SemDeDup replay: the exact k-means trajectory (shared CTE chain),
    final assignment, then the order-parallel drop rule — drop v iff a
    lower-id same-cluster vector is within the rounded-cosine threshold."""
    parts, cur = _kmeans_ctes()
    parts.append(_kmeans_assign_cte(cur, "af"))
    parts.append(
        f"""drops AS (SELECT DISTINCT hi.vec_id
  FROM af lo JOIN af hi ON lo.centroid_id = hi.centroid_id
                       AND lo.vec_id < hi.vec_id
  JOIN v va ON va.vec_id = lo.vec_id
  JOIN v vb ON vb.vec_id = hi.vec_id
  WHERE {_cos('va.e', 'vb.e')} >= {C.NEARDUP_COSINE})"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + """
SELECT a.vec_id, a.centroid_id, (d.vec_id IS NULL) AS keep
FROM af a LEFT JOIN drops d ON d.vec_id = a.vec_id"""
    )


def _pagerank_sql() -> str:
    """Replay graph.pagerank's trajectory iteration-by-iteration: same
    customer→supplier edge build, same 1/N init, same 9-dp-rounded
    (1-d)/N + d·Σ r/outdeg update, final rank rounded to 6 dp. Float
    literals use repr() so the SQL constants are the exact doubles the
    Spark side computes with."""
    d, iters = C.PAGERANK_DAMPING, C.PAGERANK_ITERS
    tele = repr(1.0 - d)
    parts = [
        """e AS (SELECT 'c' || CAST(o_custkey AS VARCHAR) AS src,
             's' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey)""",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        "od AS (SELECT src, CAST(count(*) AS DOUBLE) AS od FROM e GROUP BY src)",
        "r0 AS (SELECT node, round(1.0 / nn.n, 9) AS r FROM nodes CROSS JOIN nn)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""c{i} AS (SELECT e.dst, sum(p.r / od.od) AS c
  FROM e JOIN r{i - 1} p ON p.node = e.src JOIN od ON od.src = e.src
  GROUP BY e.dst)"""
        )
        parts.append(
            f"""r{i} AS (SELECT nodes.node,
  round({tele} / nn.n + {d!r} * coalesce(c{i}.c, 0.0), 9) AS r
  FROM nodes CROSS JOIN nn LEFT JOIN c{i} ON c{i}.dst = nodes.node)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT node, round(r, 6) AS rank FROM r{iters}"
    )


def _label_prop_sql() -> str:
    """Replay graph.label_propagation round-by-round: same symmetrized
    customer↔supplier edge table, labels init to the node id, each round
    every node adopts the most frequent neighbor label with ties to the
    lexicographically-smallest label (row_number ORDER BY c DESC, lab ==
    Spark's min(struct(-c, lab)) argmax)."""
    iters = C.LPA_ITERS
    parts = [
        """e0 AS (SELECT 'c' || CAST(o_custkey AS VARCHAR) AS src,
             's' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey)""",
        "e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)",
        "nodes AS (SELECT DISTINCT src AS node FROM e)",
        "l0 AS (SELECT node, node AS lab FROM nodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""v{i} AS (SELECT e.dst AS vnode, p.lab, count(*) AS c
  FROM e JOIN l{i - 1} p ON p.node = e.src GROUP BY 1, 2)"""
        )
        parts.append(
            f"""b{i} AS (SELECT vnode, lab FROM (
    SELECT vnode, lab,
           row_number() OVER (PARTITION BY vnode ORDER BY c DESC, lab) AS rn
    FROM v{i}) WHERE rn = 1)"""
        )
        parts.append(
            f"""l{i} AS (SELECT nodes.node, coalesce(b{i}.lab, nodes.node) AS lab
  FROM nodes LEFT JOIN b{i} ON b{i}.vnode = nodes.node)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
sizes AS (SELECT lab, CAST(count(*) AS BIGINT) AS n_members
          FROM l{iters} GROUP BY lab)
SELECT l.node, l.lab AS community, s.n_members
FROM l{iters} l JOIN sizes s ON s.lab = l.lab"""
    )


def _semdedup_apply_sql() -> str:
    """The semdedup trajectory + drop rule, applied: survivors summarized
    per label with an exact-integer id checksum."""
    parts, cur = _kmeans_ctes()
    parts.append(_kmeans_assign_cte(cur, "af"))
    parts.append(
        f"""drops AS (SELECT DISTINCT hi.vec_id
  FROM af lo JOIN af hi ON lo.centroid_id = hi.centroid_id
                       AND lo.vec_id < hi.vec_id
  JOIN v va ON va.vec_id = lo.vec_id
  JOIN v vb ON vb.vec_id = hi.vec_id
  WHERE {_cos('va.e', 'vb.e')} >= {C.NEARDUP_COSINE})"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + """
SELECT label, CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(vec_id) AS BIGINT) AS sum_ids
FROM embeddings
WHERE vec_id NOT IN (SELECT vec_id FROM drops)
GROUP BY label"""
    )


def _pq_ctes() -> list[str]:
    """CTE chain replaying the PQ trajectory (similarity.pq_train /
    pq_encode) in LONG FORM — every subspace codebook trains
    simultaneously because the subspace index is a grouping column, so
    PQ_M never multiplies the chain length. Same init (subvectors of
    vec_id < PQ_K), same rounded-L2 argmin with lowest-id ties, same
    6-dp per-dim mean update. Ends with ``codes`` (vec_id, m, code),
    ``cw`` (codewords + self-dots), ``nrec`` (reconstruction norms) and
    ``q`` (query norms) — the pieces _ann_pq_sql and _ann_ivfpq_sql
    assemble their scoring over."""
    m, k, iters = C.PQ_M, C.PQ_K, C.PQ_ITERS

    def d2(sv: str, c: str) -> str:
        return (
            f"round(list_dot_product({sv}, {sv})"
            f" - 2 * list_dot_product({sv}, {c})"
            f" + list_dot_product({c}, {c}), {C.COSINE_ROUND})"
        )

    def assign(cent: str, name: str, out: str) -> str:
        return f"""{name} AS (SELECT vec_id, m, centroid_id AS {out} FROM (
    SELECT s.vec_id, s.m, c.centroid_id,
           row_number() OVER (PARTITION BY s.vec_id, s.m
               ORDER BY {d2('s.sv', 'c.c')} ASC, c.centroid_id) AS rn
    FROM sub s JOIN {cent} c USING (m)) WHERE rn = 1)"""

    parts = [
        "v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)",
        f"""sub AS (SELECT vec_id, CAST(mm AS INT) AS m,
    e[CAST(mm * (len(e) // {m}) + 1 AS INT)
      : CAST((mm + 1) * (len(e) // {m}) AS INT)] AS sv
    FROM v, UNNEST(range({m})) AS t(mm))""",
        f"""c0 AS (SELECT m, vec_id AS centroid_id, sv AS c
    FROM sub WHERE vec_id < {k})""",
    ]
    cur = "c0"
    for i in range(1, iters + 1):
        parts.append(assign(cur, f"a{i}", "centroid_id"))
        parts.append(
            f"""c{i} AS (SELECT m, centroid_id,
    array_agg(round(mn, 6) ORDER BY dim) AS c FROM (
      SELECT a.m, a.centroid_id, CAST(i AS INT) AS dim,
             avg(sv[CAST(i AS INT) + 1]) AS mn
      FROM a{i} a JOIN sub s ON s.vec_id = a.vec_id AND s.m = a.m,
           UNNEST(range(len(s.sv))) AS t(i)
      GROUP BY 1, 2, 3) GROUP BY 1, 2)"""
        )
        cur = f"c{i}"
    parts += [
        assign(cur, "codes", "code"),
        f"""cw AS (SELECT m, centroid_id, c, list_dot_product(c, c) AS scc
    FROM {cur})""",
        """nrec AS (SELECT co.vec_id,
    sqrt(list_reduce(list_prepend(0.0, array_agg(w.scc ORDER BY co.m)),
                     (a, x) -> a + x)) AS rnorm
    FROM codes co JOIN cw w ON w.m = co.m AND w.centroid_id = co.code
    GROUP BY co.vec_id)""",
        f"""q AS (SELECT vec_id, sqrt(list_dot_product(e, e)) AS qn
    FROM v WHERE vec_id < {C.ANN_QUERY_MAX_ID})""",
    ]
    return parts


def _pq_score_sql(parts: list[str], terms_cte: str, topk: int) -> str:
    """Shared ADC tail: the bit-stable subspace-ordered fold
    (list_prepend(0.0, ...) + list_reduce, the ex_fingerprint idiom) so
    the final 6-dp cosine round can't drift on aggregation order, then
    the (cos DESC, neighbor_id) top-k."""
    parts = parts + [
        terms_cte,
        """adc AS (SELECT qid, nid,
    list_reduce(list_prepend(0.0, array_agg(term ORDER BY m)),
                (a, x) -> a + x) AS dp
    FROM terms GROUP BY 1, 2)""",
        f"""sc AS (SELECT a.qid AS vec_id, a.nid AS neighbor_id,
    round(a.dp / (q.qn * n.rnorm), {C.COSINE_ROUND}) AS cos
    FROM adc a JOIN q ON q.vec_id = a.qid
               JOIN nrec n ON n.vec_id = a.nid)""",
    ]
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT vec_id, rnk, neighbor_id FROM (
  SELECT vec_id, neighbor_id,
         row_number() OVER (PARTITION BY vec_id
             ORDER BY cos DESC, neighbor_id) AS rnk
  FROM sc) WHERE rnk <= {topk}"""
    )


def _ann_pq_sql() -> str:
    """Flat PQ-ADC: every corpus vector is a candidate."""
    terms = f"""terms AS (SELECT qs.vec_id AS qid, co.vec_id AS nid, qs.m,
    list_dot_product(qs.sv, w.c) AS term
    FROM sub qs
    JOIN codes co ON co.m = qs.m AND co.vec_id <> qs.vec_id
    JOIN cw w ON w.m = co.m AND w.centroid_id = co.code
    WHERE qs.vec_id < {C.ANN_QUERY_MAX_ID})"""
    return _pq_score_sql(_pq_ctes(), terms, C.ANN_TOPK)


def _ann_ivfpq_sql() -> str:
    """IVFADC: the _ann_ivf_sql candidate rule (mod-subsampled centroids,
    rounded-cosine assignment, nprobe probes) prunes the candidate set;
    the PQ codes score it — the composition the two indexes exist for."""
    cos_xc = _cos("x.e", "c.e")
    cos_qc = _cos("q2.e", "c.e")
    parts = _pq_ctes() + [
        f"""cent AS (SELECT vec_id AS centroid_id, e FROM v
    WHERE vec_id % {C.IVF_CENTROID_MOD} = 0)""",
        f"""assign AS (SELECT vec_id, centroid_id FROM (
    SELECT x.vec_id, c.centroid_id,
           row_number() OVER (PARTITION BY x.vec_id
               ORDER BY {cos_xc} DESC, c.centroid_id) AS rn
    FROM v x CROSS JOIN cent c) WHERE rn = 1)""",
        f"""probes AS (SELECT vec_id, centroid_id FROM (
    SELECT q2.vec_id, c.centroid_id,
           row_number() OVER (PARTITION BY q2.vec_id
               ORDER BY {cos_qc} DESC, c.centroid_id) AS rn
    FROM v q2 CROSS JOIN cent c
    WHERE q2.vec_id < {C.ANN_QUERY_MAX_ID}) WHERE rn <= {C.IVF_NPROBE})""",
        """cand AS (SELECT p.vec_id AS qid, a.vec_id AS nid
    FROM probes p JOIN assign a ON a.centroid_id = p.centroid_id
    WHERE a.vec_id <> p.vec_id)""",
    ]
    terms = """terms AS (SELECT ca.qid, ca.nid, qs.m,
    list_dot_product(qs.sv, w.c) AS term
    FROM cand ca
    JOIN sub qs ON qs.vec_id = ca.qid
    JOIN codes co ON co.vec_id = ca.nid AND co.m = qs.m
    JOIN cw w ON w.m = co.m AND w.centroid_id = co.code)"""
    return _pq_score_sql(parts, terms, C.IVF_TOPK)


def _ann_ivf_trained_sql() -> str:
    """IVF probe (identical shape to _ann_ivf_sql) over the k-means-trained
    centroid table instead of the vec_id % mod subsample."""
    parts, cur = _kmeans_ctes()
    cos_qc = _cos("q.e", "c.c")
    cos_qn = _cos("q.e", "n.e")
    parts.append(_kmeans_assign_cte(cur, "assign"))
    parts.append(
        f"""probes AS (
  SELECT vec_id, centroid_id FROM (
    SELECT q.vec_id, c.centroid_id,
           row_number() OVER (PARTITION BY q.vec_id ORDER BY {cos_qc} DESC, c.centroid_id) AS rn
    FROM v q CROSS JOIN {cur} c WHERE q.vec_id < {C.ANN_QUERY_MAX_ID}) WHERE rn <= {C.IVF_NPROBE})"""
    )
    parts.append(
        """cand AS (SELECT p.vec_id, a.vec_id AS neighbor_id
         FROM probes p JOIN assign a ON a.centroid_id = p.centroid_id
         WHERE p.vec_id <> a.vec_id)"""
    )
    parts.append(
        f"""scored AS (SELECT cand.vec_id, cand.neighbor_id, {cos_qn} AS cos
           FROM cand JOIN v q ON q.vec_id = cand.vec_id
                     JOIN v n ON n.vec_id = cand.neighbor_id)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT vec_id, rnk, neighbor_id FROM (
  SELECT vec_id, neighbor_id,
         row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rnk
  FROM scored) WHERE rnk <= {C.IVF_TOPK}"""
    )


def _simhash_sql() -> str:
    return f"""
WITH tok AS (SELECT doc_id, unnest({_TOKS.format(t='text')}) AS tok FROM documents),
tb AS (SELECT doc_id, md5(tok) AS h FROM tok),
bits AS (SELECT doc_id, j,
         instr('0123456789abcdef', substr(h, CAST(floor(j / 4) AS INT) + 1, 1)) - 1 AS nib
         FROM tb, UNNEST(range(0, {C.SIMHASH_BITS})) AS u(j)),
contrib AS (SELECT doc_id, j,
            CAST(floor(nib / power(2, 3 - (j % 4))) AS BIGINT) % 2 AS bit FROM bits),
per_bit AS (SELECT doc_id, j, CAST(sum(bit * 2 - 1) AS BIGINT) AS s FROM contrib GROUP BY 1, 2)
SELECT doc_id,
       CAST(sum(CASE WHEN s > 0 THEN CAST(power(2, j) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
FROM per_bit GROUP BY doc_id
"""


def _lang_id_sql() -> str:
    return f"""
WITH t AS (SELECT doc_id, {_TOKS.format(t='text')} AS toks FROM documents),
c AS (SELECT doc_id,
  len(list_filter(toks, x -> list_contains({_STOP['en']}, x))) AS c_en,
  len(list_filter(toks, x -> list_contains({_STOP['es']}, x))) AS c_es,
  len(list_filter(toks, x -> list_contains({_STOP['de']}, x))) AS c_de,
  len(list_filter(toks, x -> list_contains({_STOP['fr']}, x))) AS c_fr
FROM t)
SELECT doc_id,
  CASE WHEN greatest(c_en, c_es, c_de, c_fr) = 0 THEN 'und'
       WHEN c_en >= greatest(c_es, c_de, c_fr) THEN 'en'
       WHEN c_es >= greatest(c_de, c_fr) THEN 'es'
       WHEN c_de >= c_fr THEN 'de'
       ELSE 'fr' END AS lang_pred
FROM c
"""


# ---- shared perceptual-oracle fragments (the one-copy discipline: the
# r10 review's _bpe_apply_ctes / _knn_edge_ctes precedent, applied to
# the image/audio/video dedup family whose CTE chains had drifted into
# four hand-copied variants each) ----

# 16-bit LSH band packing over (doc_id, bitk, bit) rows — the tail every
# Hamming-fingerprint chain shares
_HAM_BANDS_CTE = f"""bands AS (SELECT doc_id, CAST(bitk // {C.HAM_BAND_BITS} AS INT) AS band,
                         CAST(sum(bit * (1 << (bitk % {C.HAM_BAND_BITS})))
                              AS BIGINT) AS val
                  FROM bits GROUP BY 1, 2)"""

# image dHash derivation: length-gated docs -> strided gray pixels ->
# horizontal brightness-gradient bits -> LSH bands
_IMG_DHASH_CTES = f"""d AS (SELECT doc_id, text FROM documents
                   WHERE length(text) >= {C.IMG_MIN_CHARS}),
        px AS (SELECT doc_id, CAST(k AS INT) AS k,
                      unicode(substr(text,
                          CAST(k * {C.IMG_STRIDE} AS INT) + 1, 1)) % 256 AS g
               FROM d, UNNEST(range({C.IMG_DHASH_COLS * C.IMG_DHASH_ROWS})) t(k)),
        bits AS (SELECT a.doc_id,
                        (a.k // {C.IMG_DHASH_COLS}) * ({C.IMG_DHASH_COLS} - 1)
                          + (a.k % {C.IMG_DHASH_COLS}) AS bitk,
                        CASE WHEN a.g < b.g THEN 1 ELSE 0 END AS bit
                 FROM px a JOIN px b
                   ON b.doc_id = a.doc_id AND b.k = a.k + 1
                 WHERE a.k % {C.IMG_DHASH_COLS} < {C.IMG_DHASH_COLS} - 1),
        {_HAM_BANDS_CTE}"""

# audio envelope-hash derivation: length-gated docs -> windowed energy
# sums -> envelope-gradient bits -> LSH bands
_AUD_ENVELOPE_CTES = f"""d AS (SELECT doc_id, text FROM documents
                   WHERE length(text) >= {C.AUD_FP_SAMPLES}),
        w AS (SELECT doc_id, CAST(k AS INT) // {C.AUD_FP_WINDOW} AS win,
                     sum(unicode(substr(text, CAST(k AS INT) + 1, 1)) % 256) AS e
              FROM d, UNNEST(range({C.AUD_FP_SAMPLES})) t(k) GROUP BY 1, 2),
        bits AS (SELECT a.doc_id, a.win AS bitk,
                        CASE WHEN a.e < b.e THEN 1 ELSE 0 END AS bit
                 FROM w a JOIN w b ON b.doc_id = a.doc_id AND b.win = a.win + 1
                 WHERE a.win < {C.AUD_FP_SAMPLES // C.AUD_FP_WINDOW} - 1),
        {_HAM_BANDS_CTE}"""

# video keyframe sampling: per-doc 64-char frames, every 3rd sampled,
# hot frames df-capped
_VID_FRAME_CTES = f"""f AS (SELECT doc_id, text,
            unnest(range(0, CAST(ceil(length(text) / 64.0) AS BIGINT)))
              AS frame_idx
            FROM documents),
        fr AS (SELECT DISTINCT doc_id,
                      md5(substring(text, frame_idx * 64 + 1, 64)) AS h
               FROM f WHERE frame_idx % 3 = 0),
        rare AS (SELECT h FROM fr GROUP BY h
                 HAVING count(*) <= {C.VID_FRAME_DF_CAP})"""

# shared-band candidate pairs, ordered (the banding rule)
_HAM_CAND_CTE = """cand AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
                 FROM bands a JOIN bands b
                   ON a.band = b.band AND a.val = b.val AND a.doc_id < b.doc_id)"""


def _ham_verify_select(alias_a: str, alias_b: str, max_ham: int) -> str:
    """Exact xor-popcount verify over the banded candidates (terminal
    SELECT of the neardup report oracles)."""
    return f"""SELECT cand.ia AS {alias_a}, cand.ib AS {alias_b},
               CAST(sum(bit_count(xor(x.val, y.val))) AS BIGINT) AS hamming
        FROM cand
        JOIN bands x ON x.doc_id = cand.ia
        JOIN bands y ON y.doc_id = cand.ib AND y.band = x.band
        GROUP BY 1, 2
        HAVING sum(bit_count(xor(x.val, y.val))) <= {max_ham}"""


def _ham_pairs_cte(max_ham: int) -> str:
    """The same exact verify as a CTE (apply oracles feed it to CC)."""
    return f"""pairs AS (SELECT cand.ia AS da, cand.ib AS db
                  FROM cand
                  JOIN bands x ON x.doc_id = cand.ia
                  JOIN bands y ON y.doc_id = cand.ib AND y.band = x.band
                  GROUP BY 1, 2
                  HAVING sum(bit_count(xor(x.val, y.val))) <= {max_ham})"""


# recursive-CTE connected components over undirected pairs(da, db), the
# non-canonical drop set, and the per-source survivor rollup — the tail
# every *_dedup_apply oracle shares
_CC_APPLY_EPILOGUE = """edges AS (SELECT da AS u, db AS v FROM pairs
                  UNION ALL SELECT db, da FROM pairs),
        reach(node, r) AS (
            SELECT u, u FROM edges
            UNION
            SELECT e.u, rr.r FROM edges e JOIN reach rr ON rr.node = e.v
        ),
        drops AS (SELECT node FROM reach GROUP BY node HAVING min(r) <> node)
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents WHERE doc_id NOT IN (SELECT node FROM drops)
        GROUP BY source"""


ORACLES: dict[str, str] = {
    "dq01": "SELECT COUNT(*) AS n, MIN(event_id) AS min_id, MAX(event_id) AS max_id FROM events",
    "dq02": """SELECT event_id,
        CAST(FLOOR((value - 1000.0) * (1811 - 172) / (2000.0 - 1000.0)) AS BIGINT) + 172 AS sbus
        FROM events""",
    # sentinel injected deterministically (event_id % 97) and the range
    # rebased into the data so BOTH legs select rows (round-10 vacuity fix)
    "dq03": """SELECT event_id FROM (
        SELECT event_id,
               CASE WHEN event_id % 97 = 0 THEN -1.0 ELSE value END AS v
        FROM events) WHERE v BETWEEN 100 AND 200 OR v = -1""",
    "dq04": "SELECT c_custkey, c_name, c_nationkey FROM customer WHERE c_custkey = 42",
    "dq05": "SELECT s_suppkey, s_name FROM supplier ORDER BY s_name, s_suppkey LIMIT 1",
    "dq06": "SELECT c_custkey, ROW_NUMBER() OVER (ORDER BY c_custkey) AS reg_id FROM customer",
    "dq07": """SELECT user_id, event_type, value FROM (
        SELECT user_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) t WHERE rn = 1""",
    "dq08": """SELECT user_id, CAST(MAX(ts) AS TIMESTAMP) AS last_ts FROM events
        GROUP BY user_id
        HAVING MAX(ts) < (SELECT MAX(ts) FROM events) - INTERVAL 1 HOUR""",
    "dq09": """SELECT e.event_id,
        (SELECT MAX(o.event_id) FROM events o
         WHERE o.user_id = e.user_id AND o.event_type = 'purchase'
           AND o.ts <= e.ts AND o.ts > e.ts - INTERVAL 1 HOUR) AS active_override
        FROM events e WHERE e.event_type = 'click'""",
    "dq10": """SELECT u.user_id, r.r_regionkey
        FROM (SELECT DISTINCT user_id FROM events) u CROSS JOIN region r""",
    "dq11": """SELECT user_id, CAST(DATE_TRUNC('minute', ts) AS TIMESTAMP) AS w,
        MAX(event_id) AS last_event FROM events GROUP BY user_id, DATE_TRUNC('minute', ts)""",
    "dq12": """SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_v
        FROM events GROUP BY event_type""",
    "dq13": "SELECT COUNT(*) AS n FROM supplier",
    "dq14": "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events",
    "dq15": """SELECT event_id,
        json_extract_string(to_json({'user_id': user_id, 'event_type': event_type}),
                            '$.event_type') AS event_type
        FROM events""",
    "dq16": "SELECT n_nationkey, printf('%02X', n_nationkey) AS hex2 FROM nation",
    "dq17": """SELECT CASE WHEN value BETWEEN 1000 AND 2000 THEN 'valid'
                    WHEN value = -1 THEN 'skip' ELSE 'invalid' END AS cls,
        COUNT(*) AS n FROM events GROUP BY 1""",
    # every 50th doc replicated deterministically so the duplicate leg
    # fires below sf0.1 too (round-10 vacuity fix)
    "dq18": """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n FROM (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 10000000 AS doc_id, text FROM documents
        WHERE doc_id % 50 = 0)
        GROUP BY text HAVING COUNT(*) > 1""",
    "dq19": f"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        p AS (SELECT a.vec_id, b.vec_id AS neighbor_id, {_cos('a.e', 'b.e')} AS cos
              FROM v a JOIN v b ON b.vec_id <> a.vec_id WHERE a.vec_id < 50)
        SELECT vec_id, neighbor_id FROM (
          SELECT vec_id, neighbor_id,
                 row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rn
          FROM p) WHERE rn = 1""",
    "dq20": """SELECT lang, COUNT(*) AS n, MIN(n_chars) AS mn, MAX(n_chars) AS mx,
        CAST(SUM(CASE WHEN LENGTH(text) = n_chars THEN 1 ELSE 0 END) AS BIGINT) AS len_ok
        FROM documents GROUP BY lang""",
    "dq21": """SELECT l_returnflag, l_linestatus,
        ROUND(SUM(l_quantity), 2) AS sum_qty,
        ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
        ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        ROUND(AVG(l_discount), 4) AS avg_disc,
        COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus""",
    "dq22": """SELECT n.n_name,
        ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name""",
    "dq23": """SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "dq24": "SELECT user_id AS k FROM events INTERSECT SELECT c_custkey AS k FROM customer",
    "dq25": """SELECT c_custkey FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""",
    # -- extensions ---------------------------------------------------------
    "ex_dedup_exact": """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n
        FROM documents GROUP BY text""",
    "ex_minhash_sig": _minhash_sig_sql(8),
    "ex_neardup_minhash": _EXACT_JACCARD,
    # same exact semantics through the persisted bucketed-shingle pipeline
    "ex_dedup_pipeline": _EXACT_JACCARD,
    # Broder containment over the same shingle sets as the Jaccard oracle
    "ex_containment_dedup": f"""
WITH {_SHINGLES},
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
c AS (SELECT da, db, round(i * 1.0 / sa.n, 6) AS cont_a_in_b,
             round(i * 1.0 / sb.n, 6) AS cont_b_in_a
      FROM inter JOIN sizes sa ON sa.doc_id = da
      JOIN sizes sb ON sb.doc_id = db)
SELECT da AS doc_a, db AS doc_b, cont_a_in_b, cont_b_in_a
FROM c WHERE cont_a_in_b >= {C.CONTAIN_THRESHOLD}
   OR cont_b_in_a >= {C.CONTAIN_THRESHOLD}""",
    "ex_neardup_jaccard": _EXACT_JACCARD,
    "ex_simhash": _simhash_sql(),
    "ex_neardup_cosine": f"""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {_cos('a.e', 'b.e')} AS cos
              FROM v a JOIN v b ON a.vec_id < b.vec_id)
        SELECT vec_a, vec_b, cos FROM p WHERE cos >= {C.NEARDUP_COSINE}""",
    "ex_ann_filtered": f"""
        WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
                   FROM embeddings),
        p AS (SELECT a.vec_id, a.label, b.vec_id AS neighbor_id,
                     {_cos('a.e', 'b.e')} AS cos
              FROM v a JOIN v b ON b.label = a.label
                               AND b.vec_id <> a.vec_id
              WHERE a.vec_id < {C.ANN_QUERY_MAX_ID})
        SELECT vec_id, label, rnk, neighbor_id, cos FROM (
          SELECT vec_id, label, neighbor_id, cos,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY cos DESC, neighbor_id) AS rnk
          FROM p) WHERE rnk <= 3""",
    "ex_ann_topk": f"""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        p AS (SELECT a.vec_id, b.vec_id AS neighbor_id, {_cos('a.e', 'b.e')} AS cos
              FROM v a JOIN v b ON b.vec_id <> a.vec_id WHERE a.vec_id < {C.ANN_QUERY_MAX_ID})
        SELECT vec_id, rnk, neighbor_id FROM (
          SELECT vec_id, neighbor_id,
                 row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rnk
          FROM p) WHERE rnk <= {C.ANN_TOPK}""",
    "ex_ann_ivf": _ann_ivf_sql(),
    "ex_ann_lsh": f"""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        b AS (SELECT vec_id, e,
              CAST({' + '.join(f'(CASE WHEN e[{i + 1}] > 0 THEN {2**i} ELSE 0 END)' for i in range(8))}
                   AS BIGINT) AS bucket FROM v),
        pr AS (SELECT vec_id, e,
               unnest([bucket, {', '.join(f'xor(bucket, {2**i})' for i in range(8))}]) AS pb
               FROM b WHERE vec_id < {C.ANN_QUERY_MAX_ID}),
        p AS (SELECT a.vec_id, n.vec_id AS neighbor_id, {_cos('a.e', 'n.e')} AS cos
              FROM pr a JOIN b n ON a.pb = n.bucket AND a.vec_id <> n.vec_id)
        SELECT vec_id, rnk, neighbor_id FROM (
          SELECT vec_id, neighbor_id,
                 row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rnk
          FROM p) WHERE rnk <= {C.IVF_TOPK}""",
    # directed LSH-candidate top-k per vector, then mutual-edge filter:
    # both endpoints must name each other (src < dst canonical order)
    "ex_knn_graph": _knn_graph_sql(),
    "ex_knn_clusters": _knn_clusters_sql(),
    "ex_knn_dedup_apply": _knn_dedup_apply_sql(),
    # class-balanced downsample: every lang reduced to the minority class
    # size; membership = deterministic md5-order top-m per class
    "ex_balance_classes": """
        WITH per AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        mm AS (SELECT CAST(min(n) AS BIGINT) AS m FROM per),
        r AS (SELECT doc_id, lang,
              row_number() OVER (PARTITION BY lang
                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
              FROM documents)
        SELECT doc_id, lang, CAST(rnk AS BIGINT) AS sample_rank
        FROM r, mm WHERE rnk <= mm.m""",
    # token-budget mixture: every float op is a correctly-rounded IEEE
    # primitive in a pinned order — z folds sqrt(ts) SEQUENTIALLY over
    # sources sorted by name (list_reduce mirrors Spark's aggregate fold),
    # so the budget is bit-identical; md5-order prefix per source
    "ex_token_budget_mix": f"""
        WITH d AS (SELECT doc_id, source,
                   CAST(len({_TOKS.format(t='text')}) AS BIGINT) AS n_tok
                   FROM documents),
        per AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS ts
                FROM d GROUP BY source),
        tot AS (SELECT CAST(sum(ts) AS BIGINT) AS tt,
                       list_reduce(
                         list_prepend(CAST(0.0 AS DOUBLE),
                           list_transform(
                             list(ts ORDER BY source),
                             s -> sqrt(CAST(s AS DOUBLE)))),
                         (acc, x) -> acc + x) AS z
                FROM per),
        bud AS (SELECT source,
                CAST(floor(sqrt(CAST(ts AS DOUBLE)) / z * tt / 2.0)
                     AS BIGINT) AS budget
                FROM per, tot),
        c AS (SELECT doc_id, source, n_tok,
              CAST(sum(n_tok) OVER (PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tok_cum
              FROM d)
        SELECT c.doc_id, c.source, c.n_tok, c.tok_cum
        FROM c JOIN bud USING (source) WHERE c.tok_cum <= bud.budget""",
    "ex_zorder_layout": _zorder_layout_sql(modular_time=False),
    # the READ-side equivalence check: the oracle answers the same box
    # with the direct predicate and NO z-math — a green match proves the
    # engine's bucket prefilter dismissed nothing
    "ex_zrange_query": """
        WITH e AS (SELECT event_type, user_id,
                   epoch_ms(CAST(ts AS TIMESTAMP)) AS t_ms FROM events),
        bd AS (SELECT min(t_ms) AS mn, max(t_ms) AS mx,
                      min(user_id) AS umn, max(user_id) AS umx FROM e),
        box AS (SELECT umn + (umx - umn + 1) // 4 AS qulo,
                       umn + (3 * (umx - umn + 1)) // 4 - 1 AS quhi,
                       mn + (mx - mn + 1) // 4 AS qtlo,
                       mn + (3 * (mx - mn + 1)) // 4 - 1 AS qthi FROM bd)
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM e, box
        WHERE user_id BETWEEN qulo AND quhi AND t_ms BETWEEN qtlo AND qthi
        GROUP BY event_type""",
    # the SAME no-z-math direct-predicate proof as ex_zrange_query, on the
    # skewed (sixteenth x half) box the BIGMIN interval cover targets —
    # matching the Spark side proves the z-interval prefilter is lossless
    "ex_zrange_bigmin": """
        WITH e AS (SELECT event_type, user_id,
                   epoch_ms(CAST(ts AS TIMESTAMP)) AS t_ms FROM events),
        bd AS (SELECT min(t_ms) AS mn, max(t_ms) AS mx,
                      min(user_id) AS umn, max(user_id) AS umx FROM e),
        box AS (SELECT umn + (7 * (umx - umn + 1)) // 16 AS qulo,
                       umn + (8 * (umx - umn + 1)) // 16 - 1 AS quhi,
                       mn + (mx - mn + 1) // 4 AS qtlo,
                       mn + (3 * (mx - mn + 1)) // 4 - 1 AS qthi FROM bd)
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM e, box
        WHERE user_id BETWEEN qulo AND quhi AND t_ms BETWEEN qtlo AND qthi
        GROUP BY event_type""",
    "st_zorder_layout": _zorder_layout_sql(modular_time=True),
    "ex_lang_id": _lang_id_sql(),
    "ex_text_stats": _TEXT_STATS_BASE
    + f"""SELECT doc_id, n_tokens, avg_token_len, punct_ratio, stopword_ratio,
        round({C.QUALITY_STOPWORD_W} * stopword_ratio
              + {C.QUALITY_LENGTH_W} * least(n_tokens / {C.QUALITY_LENGTH_NORM}, 1.0)
              + {C.QUALITY_CLEAN_W} * (1.0 - punct_ratio), 4) AS quality
        FROM s""",
    "ex_token_count": f"""SELECT doc_id,
        CAST(len({_TOKS.format(t='text')}) AS BIGINT) AS ws_tokens,
        CAST(len(regexp_extract_all(text, '{C.PRETOKEN_RE}')) AS BIGINT) AS re_tokens
        FROM documents""",
    "ex_fingerprint": f"""SELECT doc_id,
        md5(array_to_string(list_sort(list_distinct({_TOKS.format(t='lower(text)')})), ' ')) AS fp_key,
        list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(range(1, least(length(text), {C.ROLLING_MAX_CHARS}) + 1),
                         i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT))),
          (h, c) -> (h * {C.ROLLING_BASE} + c) % {C.ROLLING_MOD}) AS fp_roll
        FROM documents""",
    "ex_sessionize": f"""
        WITH x AS (SELECT user_id, ts, event_id,
            CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_ns(ts) - epoch_ns(lag(ts) OVER w) > {C.SESSION_GAP_MINUTES} * 60 * CAST(1000000000 AS BIGINT)
                 THEN 1 ELSE 0 END AS nw
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (SELECT user_id, ts,
              CAST(sum(nw) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
              FROM x)
        SELECT user_id, session_id, count(*) AS n_events,
               CAST(min(ts) AS TIMESTAMP) AS start_ts, CAST(max(ts) AS TIMESTAMP) AS end_ts
        FROM s GROUP BY user_id, session_id""",
    "ex_multimodal_meta": """SELECT doc_id,
        CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        md5(text) AS content_md5 FROM documents""",
    # -- relational-analytics widening --------------------------------------
    "ex_rollup": """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "ex_pivot": """SELECT user_id,
        CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
        FROM events GROUP BY user_id""",
    "ex_percentiles": """SELECT event_type,
        ROUND(quantile_cont(value, 0.5), 4) AS p50,
        ROUND(quantile_cont(value, 0.9), 4) AS p90
        FROM events GROUP BY event_type""",
    "ex_window_analytics": """SELECT o_orderkey, o_custkey,
        ROW_NUMBER() OVER w AS rnk,
        ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey
              ROWS UNBOUNDED PRECEDING), 2) AS running_total,
        ROUND(LAG(o_totalprice, 1) OVER w, 2) AS prev_price
        FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)""",
    "ex_semijoin": """SELECT c_custkey FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "ex_topk_per_group": """SELECT p_brand, rnk, p_partkey, p_retailprice FROM (
        SELECT p_brand, p_partkey, p_retailprice,
               ROW_NUMBER() OVER (PARTITION BY p_brand
                                  ORDER BY p_retailprice DESC, p_partkey) AS rnk
        FROM part) WHERE rnk <= 3""",
    "ex_shipping_priority": """SELECT o.o_orderkey, CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
        ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY o.o_orderkey, o.o_orderdate
        ORDER BY revenue DESC, o.o_orderkey LIMIT 10""",
    "ex_cube": """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        ROUND(SUM(o_totalprice), 2) AS sum_price
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
    "ex_grouping_sets": """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""",
    "ex_exists_shipped": """SELECT o_orderpriority, COUNT(*) AS n FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
        GROUP BY o_orderpriority""",
    # direction flipped: events' users ⊆ customer keys made the original
    # form always-empty (round-10 vacuity fix)
    "ex_except": """SELECT DISTINCT c_custkey AS k FROM customer
        EXCEPT SELECT DISTINCT user_id AS k FROM events""",
    "ex_distinct_agg": """SELECT event_type, COUNT(DISTINCT user_id) AS nu,
        COUNT(*) AS n FROM events GROUP BY event_type""",
    "ex_volume_shipping": """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        CAST(year(l.l_shipdate) AS INT) AS l_year,
        COUNT(*) AS n_lines,
        CAST(CAST(SUM(CAST(CASE WHEN l.l_extendedprice >= 0
             THEN floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
             ELSE -floor(-(l.l_extendedprice * (1 - l.l_discount)) * 100 + 0.5)
             END AS BIGINT)) AS HUGEINT) AS DOUBLE) / 100.0 AS revenue
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
        JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
        WHERE n1.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
          AND n2.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
          AND n1.n_name <> n2.n_name
          AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)""",
    # the correlated form the Spark plan decorrelates: an IN over a HAVING
    # whose threshold is a correlated scalar aggregate (exact-integer
    # compare — l_quantity is integral, so CAST AS BIGINT is lossless)
    "ex_part_promotion": """SELECT s_suppkey, s_name,
        ROUND(s_acctbal, 2) AS acctbal
        FROM supplier
        WHERE s_suppkey IN (
          SELECT l1.l_suppkey
          FROM lineitem l1 JOIN part p ON p.p_partkey = l1.l_partkey
          WHERE p.p_name LIKE '%red%'
            AND l1.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l1.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          GROUP BY l1.l_partkey, l1.l_suppkey
          HAVING CAST(SUM(CAST(l1.l_quantity AS BIGINT)) AS BIGINT) * 10 >
            (SELECT CAST(SUM(CAST(l2.l_quantity AS BIGINT)) AS BIGINT) * 3
             FROM lineitem l2 JOIN part p2 ON p2.p_partkey = l2.l_partkey
             WHERE p2.p_name LIKE '%red%'
               AND l2.l_partkey = l1.l_partkey
               AND l2.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
               AND l2.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'))""",
    "ex_custdist": """SELECT c_count, COUNT(*) AS custdist FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey) GROUP BY c_count""",
    "ex_promo_share": """SELECT ROUND(
        100.0 * SUM(CASE WHEN p_size > 25 THEN l_extendedprice * (1 - l_discount) END)
              / SUM(l_extendedprice * (1 - l_discount)), 4) AS large_share
        FROM lineitem JOIN part ON l_partkey = p_partkey""",
    "ex_scalar_funcs": """SELECT n_nationkey,
        upper(n_name) AS up, lower(n_name) AS lo,
        substring(n_name, 1, 3) AS pre3,
        CAST(length(n_name) AS BIGINT) AS len,
        reverse(n_name) AS rev,
        lpad(CAST(n_nationkey AS VARCHAR), 4, '0') AS pad,
        replace(n_name, 'A', '@') AS repl,
        CAST(n_nationkey % 7 AS BIGINT) AS m7,
        ROUND(sqrt(n_nationkey), 6) AS rt,
        CAST(abs(n_nationkey - 12) AS BIGINT) AS dist12
        FROM nation""",
    "ex_date_funcs": """SELECT o_orderkey,
        CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
        CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS m,
        CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS d,
        CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS q,
        CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon_start,
        CAST(o_orderdate + INTERVAL 90 DAY AS TIMESTAMP) AS due,
        CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS BIGINT) AS age_days
        FROM orders""",
    # payloads are ASCII (asserted in tests), so frames computed on VARCHAR
    # equal the engine's byte-space frames
    "ex_multimodal_frames": """
        WITH f AS (SELECT doc_id, text,
            unnest(range(0, CAST(ceil(length(text) / 64.0) AS BIGINT))) AS frame_idx
            FROM documents)
        SELECT doc_id, frame_idx,
               md5(substring(text, frame_idx * 64 + 1, 64)) AS frame_md5
        FROM f WHERE frame_idx % 3 = 0""",
    "ex_string_funcs2": """SELECT p_partkey,
        translate(p_name, 'aeiou', 'AEIOU') AS tr,
        split_part(p_name, ' ', 1) AS w1,
        repeat(substring(p_name, 1, 2), 3) AS rep,
        substring(p_name, 1, 4) AS l4,
        substring(p_name, length(p_name) - 3, 4) AS r4,
        CAST(strpos(p_name, 'a') AS BIGINT) AS pos_a
        FROM part""",
    "ex_map_funcs": """SELECT l_orderkey, l_linenumber,
        ROUND(map(['qty', 'tax'], [l_quantity, l_tax])['qty'][1], 2) AS qty,
        CAST(cardinality(map(['qty', 'tax'], [l_quantity, l_tax])) AS BIGINT) AS msz
        FROM lineitem""",
    "ex_union_all": """SELECT k, COUNT(*) AS n FROM (
        SELECT user_id AS k FROM events
        UNION ALL SELECT c_custkey AS k FROM customer) GROUP BY k""",
    "ex_rank_funcs": """SELECT o_orderkey, o_custkey,
        CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        ROUND(percent_rank() OVER w, 6) AS prnk,
        ROUND(cume_dist() OVER w, 6) AS cd,
        CAST(ntile(4) OVER w AS BIGINT) AS quartile
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)""",
    "ex_fuzzy_match": """SELECT a.n_nationkey AS ka, b.n_nationkey AS kb,
        CAST(levenshtein(a.n_name, b.n_name) AS BIGINT) AS dist
        FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
        WHERE levenshtein(a.n_name, b.n_name) <= 6""",
    "ex_bitwise": """SELECT n_nationkey,
        CAST(n_nationkey & 12 AS BIGINT) AS band,
        CAST(n_nationkey | 5 AS BIGINT) AS bor,
        CAST(xor(n_nationkey, 9) AS BIGINT) AS bxor,
        CAST(n_nationkey << 2 AS BIGINT) AS shl,
        CAST(n_nationkey >> 1 AS BIGINT) AS shr
        FROM nation""",
    "ex_gapfill": """
        WITH pm AS (SELECT user_id, date_trunc('minute', ts) AS w, COUNT(*) AS n,
                           round(avg(value), 4) AS avg_v
                    FROM events WHERE user_id < 20 GROUP BY 1, 2),
        b AS (SELECT user_id, min(w) AS lo, max(w) AS hi FROM pm GROUP BY 1),
        grid AS (SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 MINUTE)) AS w
                 FROM b),
        j AS (SELECT g.user_id, g.w, pm.n, pm.avg_v
              FROM grid g LEFT JOIN pm ON pm.user_id = g.user_id AND pm.w = g.w)
        SELECT user_id, CAST(w AS TIMESTAMP) AS w,
               CAST(COALESCE(n, 0) AS BIGINT) AS n,
               last_value(avg_v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY w
                   ROWS UNBOUNDED PRECEDING) AS avg_locf
        FROM j""",
    "ex_scalar_subquery": """SELECT o_orderkey,
        (SELECT ROUND(MIN(l_extendedprice), 2) FROM lineitem
         WHERE l_orderkey = o_orderkey) AS min_price
        FROM orders""",
    "ex_null_logic": """SELECT event_type,
        COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_present,
        COUNT(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) IS NULL
              THEN 1 END) AS k_absent,
        CAST(SUM(COALESCE(CAST(json_extract_string(props, '$.k') AS BIGINT), 0))
             AS BIGINT) AS k_sum,
        COUNT(CASE WHEN user_id IS NOT DISTINCT FROM 42 THEN 1 END) AS user42,
        COUNT(NULLIF(CAST(FLOOR(value) AS BIGINT), -1)) AS non_sentinel
        FROM events GROUP BY event_type""",
    "ex_group_concat": """SELECT n_regionkey,
        string_agg(n_name, ',' ORDER BY n_name) AS nations, COUNT(*) AS n
        FROM nation GROUP BY n_regionkey""",
    "ex_regex_funcs": """SELECT p_partkey,
        coalesce(regexp_extract(p_name, '([a-z]+)', 1), '') AS first_word,
        regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        regexp_matches(p_name, '^[a-m]') AS first_half
        FROM part""",
    "ex_histogram": """SELECT CAST(FLOOR(value / 100) AS BIGINT) AS bin,
        COUNT(*) AS n, ROUND(AVG(value), 4) AS avg_v
        FROM events GROUP BY bin""",
    "ex_ship_priority_counts": """
        SELECT l_linestatus,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_count
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_linestatus""",
    # exact-cents revenue of the three-way disjunction; rounding per line
    # BEFORE the sum keeps the scalar exact under any partitioning
    "ex_disjunctive_revenue": """
        WITH j AS (SELECT CAST(l_quantity AS BIGINT) AS q,
                          p_brand, p_size,
                          CAST(CASE WHEN l_extendedprice >= 0
                               THEN floor(l_extendedprice * (1 - l_discount)
                                          * 100 + 0.5)
                               ELSE -floor(-(l_extendedprice * (1 - l_discount))
                                           * 100 + 0.5)
                               END AS BIGINT) AS cents
                   FROM lineitem JOIN part ON p_partkey = l_partkey)
        SELECT CAST(count(*) AS BIGINT) AS n_lines,
               CAST(CAST(sum(cents) AS HUGEINT) AS DOUBLE) / 100.0 AS revenue
        FROM j
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
               AND q BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
               AND q BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
               AND q BETWEEN 20 AND 30)""",
    # Q18-shape: IN over a HAVING aggregate — the decorrelation the Spark
    # plan turns into a broadcast semi-set probe
    "ex_large_orders": """
        SELECT c.c_custkey, c.c_name, o.o_orderkey,
               CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
               ROUND(o.o_totalprice, 2) AS price,
               CAST(s.sum_qty AS BIGINT) AS sum_qty
        FROM orders o
        JOIN (SELECT l_orderkey,
                     sum(CAST(l_quantity AS BIGINT)) AS sum_qty
              FROM lineitem GROUP BY 1
              HAVING sum(CAST(l_quantity AS BIGINT)) > 200) s
          ON s.l_orderkey = o.o_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey""",
    # the correlated-AVG form the Spark plan decorrelates (window over
    # one scan); revenue in exact integer cents, ONE integral divide
    "ex_small_qty_revenue": """
        WITH li AS (SELECT l_partkey,
                           CAST(l_quantity AS BIGINT) AS q,
                           CAST(CASE WHEN l_extendedprice >= 0
                                THEN floor(l_extendedprice * 100 + 0.5)
                                ELSE -floor(-l_extendedprice * 100 + 0.5) END
                                AS BIGINT) AS cents
                    FROM lineitem JOIN part ON p_partkey = l_partkey
                    WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')),
        small AS (SELECT cents FROM (
                    SELECT cents, q,
                           sum(q) OVER (PARTITION BY l_partkey) AS sum_q,
                           count(*) OVER (PARTITION BY l_partkey) AS cnt
                    FROM li) WHERE q * 5 * cnt < sum_q)
        SELECT CAST(count(*) AS BIGINT) AS n_lines,
               CAST((CAST(sum(cents) AS HUGEINT) * 200 + 700) // 1400
                    AS BIGINT) / 100.0 AS avg_yearly
        FROM small""",
    # BM25: identical expression text as the Spark side (single ln at
    # 6-dp micro-units, integer sum — see text.bm25_topk's discipline)
    "ex_bm25": f"""
        WITH tok AS (SELECT doc_id, t AS term FROM (
                 SELECT doc_id, unnest({_TOKS.format(t='lower(text)')}) AS t
                 FROM documents) WHERE length(t) > 0),
        dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
               FROM tok GROUP BY 1),
        sc AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM dl)
                          AS n_docs,
                      (SELECT CAST(sum(dl) AS BIGINT) FROM dl)
                          AS total_len),
        qdf AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
                FROM tok WHERE term IN ('join', 'merge', 'sort') GROUP BY 1),
        tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
               FROM tok WHERE term IN ('join', 'merge', 'sort') GROUP BY 1, 2),
        contrib AS (SELECT tf.doc_id,
                CAST(floor(ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) * ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) / (CAST(tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * (CAST(dl AS DOUBLE) * CAST(n_docs AS DOUBLE) / CAST(total_len AS DOUBLE))))) * 1000000.0 + 0.5) AS BIGINT) AS c_micro
            FROM tf JOIN dl USING (doc_id) JOIN qdf USING (term), sc),
        scored AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits,
                          CAST(sum(c_micro) AS BIGINT) AS score_micro
                   FROM contrib GROUP BY 1)
        SELECT * FROM (
          SELECT row_number() OVER (ORDER BY score_micro DESC, doc_id)
                     AS rnk,
                 doc_id, n_hits, score_micro,
                 CAST(score_micro AS DOUBLE) / 1000000.0
                     AS score
          FROM scored) WHERE rnk <= 20""",
    "ex_tfidf": f"""
        WITH tok AS (SELECT doc_id, unnest({_TOKS.format(t='lower(text)')}) AS term
                     FROM documents),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
        dfc AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
        scored AS (SELECT t.doc_id, t.term, t.tf,
                          round(t.tf * ln((SELECT COUNT(*) FROM documents) * 1.0 / d.df), 6)
                              AS tfidf
                   FROM tf t JOIN dfc d ON t.term = d.term WHERE t.doc_id < 50)
        SELECT doc_id, rnk, term, tfidf FROM (
            SELECT doc_id, term, tfidf,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY tfidf DESC, term) AS rnk
            FROM scored) WHERE rnk <= 3""",
    "ex_stat_agg": """SELECT event_type,
        ROUND(corr(value, CAST(user_id AS DOUBLE)), 4) AS corr_uv,
        ROUND(covar_samp(value, CAST(user_id AS DOUBLE)), 4) AS cov_uv,
        ROUND(stddev_samp(value), 4) AS sd_v,
        ROUND(var_samp(value), 4) AS var_v
        FROM events GROUP BY event_type""",
    # sketch-quantile gate: Spark emits out-of-band approximate medians;
    # expected result is the empty set with this schema
    "ex_approx_quantile": """SELECT event_type, CAST(NULL AS DOUBLE) AS approx_p50
        FROM events WHERE FALSE""",
    "ex_semantic_search": f"""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        p AS (SELECT a.vec_id, b.vec_id AS neighbor_id, {_cos('a.e', 'b.e')} AS cos
              FROM v a JOIN v b ON b.vec_id <> a.vec_id WHERE a.vec_id < 5),
        hits AS (SELECT vec_id, neighbor_id, rnk FROM (
            SELECT vec_id, neighbor_id,
                   row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rnk
            FROM p) WHERE rnk <= 3)
        SELECT h.vec_id, h.rnk, h.neighbor_id, d.n_chars
        FROM hits h JOIN documents d ON d.doc_id = h.neighbor_id""",
    # the sketch-accuracy gate: the Spark side emits tolerance VIOLATIONS,
    # so the expected result is the empty set with this exact schema
    "ex_approx_distinct": """SELECT event_type, CAST(NULL AS BIGINT) AS approx,
        CAST(NULL AS BIGINT) AS exact FROM events WHERE FALSE""",
    "ex_unpivot": """SELECT l_returnflag, measure, ROUND(SUM(val), 2) AS total FROM (
        SELECT l_returnflag, 'quantity' AS measure, l_quantity AS val FROM lineitem
        UNION ALL SELECT l_returnflag, 'discount', l_discount FROM lineitem
        UNION ALL SELECT l_returnflag, 'tax', l_tax FROM lineitem)
        GROUP BY l_returnflag, measure""",
    "ex_scd2_history": """SELECT user_id, event_id, ROUND(value, 4) AS val,
        CAST(ts AS TIMESTAMP) AS valid_from,
        CAST(lead(ts) OVER w AS TIMESTAMP) AS valid_to,
        (lead(ts) OVER w IS NULL) AS is_current
        FROM events WHERE event_type = 'purchase'
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
    "ex_range_window": """SELECT event_id, user_id,
        ROUND(SUM(value) OVER w, 4) AS sum_1h,
        CAST(COUNT(*) OVER w AS BIGINT) AS n_1h
        FROM (SELECT *, epoch_us(ts) // 1000000 AS tsec FROM events)
        WINDOW w AS (PARTITION BY user_id ORDER BY tsec
                     RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)""",
    "ex_array_agg": """SELECT l_orderkey,
        array_to_string(lines, ',') AS lines_csv,
        CAST(len(lines) AS BIGINT) AS n,
        array_to_string(list_slice(lines, 1, 2), ',') AS first2_csv,
        list_contains(lines, 1) AS has1,
        list_max(lines) AS mx
        FROM (SELECT l_orderkey, list_sort(list(l_linenumber)) AS lines
              FROM lineitem GROUP BY l_orderkey)""",
    "ex_udf_surface": """SELECT event_id,
        CAST(FLOOR((CAST(FLOOR(value) AS BIGINT) - 1000) * 1639 / 1000.0) + 172 AS BIGINT)
            AS sbus,
        (CAST(FLOOR(value) AS INT) = -1
         OR CAST(FLOOR(value) AS INT) BETWEEN 1000 AND 2000) AS ok,
        CAST(FLOOR(value) AS INT) AS patched0,
        'A1:B2:C3:D4:E5:F6' AS mac,
        CAST(3000 AS BIGINT) AS ttl
        FROM events""",
    # -- streaming entries: checked against their batch analogs -------------
    # S3/F1 wire round-trip: recompute the deterministic channel arithmetic
    # directly — the Spark side must recover exactly these values from the
    # 16-byte binary frames, and route exactly the %97 truncations AND the
    # %193 NULL payloads to dead (null is malformed, never silently dropped)
    "ex_frame_decode": f"""
        WITH base AS (
            SELECT event_type,
                   (event_id % 97 = 0 OR event_id % 193 = 0) AS malformed,
                   ({' + '.join(f'(1000 + (event_id * 7 + {i * 131}) % 1001)' for i in range(8))})
                       AS row_sum
            FROM events)
        SELECT event_type,
               CAST(sum(CASE WHEN NOT malformed THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
               CAST(sum(CASE WHEN malformed THEN 1 ELSE 0 END) AS BIGINT) AS n_dead,
               CAST(sum(CASE WHEN NOT malformed THEN row_sum ELSE 0 END) AS BIGINT)
                   AS checksum
        FROM base GROUP BY event_type""",
    # delivery round-trip: if the keyed foreachBatch sink delivered every
    # source row exactly once, the read-back aggregate equals the direct one
    "st_sink_roundtrip": """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        round(sum(value), 4) AS sum_v,
        CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct
        FROM events GROUP BY event_type""",
    # K3: if the console sink's serialized JSON docs parse back to exactly
    # the source rows, this aggregate over the parsed docs equals the
    # direct one (serialization lossless + exactly-once-complete delivery)
    "st_console_roundtrip": """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        round(sum(value), 4) AS sum_v,
        CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct
        FROM events GROUP BY event_type""",
    "st_latest_user": """SELECT user_id, event_type, value FROM (
        SELECT user_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) t WHERE rn = 1""",
    "st_window_counts": """SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS w,
        event_type, COUNT(*) AS n FROM events GROUP BY 1, 2""",
    "st_override_asof": """SELECT e.event_id,
        (SELECT MAX(o.event_id) FROM events o
         WHERE o.user_id = e.user_id AND o.event_type = 'purchase'
           AND o.ts <= e.ts AND o.ts > e.ts - INTERVAL 1 HOUR) AS active_override
        FROM events e WHERE e.event_type = 'click'""",
    # session_window merges while next_ts < prev_ts + gap (end exclusive),
    # so the batch form breaks sessions on diff >= gap.
    "st_session_window": f"""
        WITH x AS (SELECT user_id, ts, event_id,
            CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_ns(ts) - epoch_ns(lag(ts) OVER w)
                         >= {C.SESSION_GAP_MINUTES} * 60 * CAST(1000000000 AS BIGINT)
                 THEN 1 ELSE 0 END AS nw
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (SELECT user_id, ts, event_id,
              CAST(sum(nw) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
              FROM x)
        SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS s_start, COUNT(*) AS n,
               MAX(event_id) AS last_event
        FROM s GROUP BY user_id, sid""",
    # 1 h windows sliding by 30 min: every event lands in exactly the two
    # epoch-aligned windows starting at bucket(ts) and bucket(ts) - 30 min.
    "st_sliding_counts": """
        WITH e AS (SELECT event_type, epoch_us(ts) AS tus FROM events),
        c AS (SELECT event_type, tus,
                     unnest([(tus // 1800000000) * 1800000000,
                             (tus // 1800000000) * 1800000000 - 1800000000]) AS w
              FROM e)
        SELECT make_timestamp(w) AS w_start, event_type, COUNT(*) AS n
        FROM c WHERE tus >= w AND tus < w + 3600000000
        GROUP BY w, event_type""",
    "st_dedup": """SELECT DISTINCT user_id, event_type FROM events""",
    "st_content_dedup": f"SELECT DISTINCT simhash FROM ({_simhash_sql()})",
    "st_ack_tracker": """
        WITH r AS (SELECT CAST(user_id % 8 + 1 AS INT) AS id, ts, event_id,
                          (event_id % 3 <> 0) AS ok FROM events),
        latest AS (SELECT id, ok FROM (
            SELECT id, ok, row_number() OVER (PARTITION BY id
                ORDER BY ts DESC, event_id DESC) AS rn FROM r) WHERE rn = 1)
        SELECT l.id, l.ok AS connection_state,
               (SELECT CAST(max(ts) AS TIMESTAMP) FROM r
                WHERE r.id = l.id AND r.ok) AS last_successful_send
        FROM latest l""",
    "st_stream_join": """SELECT c.event_id AS click_id, p.event_id AS purchase_id
        FROM events c JOIN events p
          ON c.user_id = p.user_id AND c.event_type = 'click' AND p.event_type = 'purchase'
         AND p.ts <= c.ts AND p.ts > c.ts - INTERVAL 1 HOUR""",
    # command_plane_stream synthesizes one command per event with
    # event_id % 10 selecting the failure mode; the oracle maps each residue
    # to the verdict the validation pipeline must produce.
    "st_command_plane": """
        SELECT CASE event_id % 10
            WHEN 0 THEN 'parse_error' WHEN 1 THEN 'parse_error'
            WHEN 2 THEN 'unknown_command' WHEN 3 THEN 'missing_field'
            WHEN 4 THEN 'bad_channel_count' WHEN 5 THEN 'bad_duration'
            WHEN 6 THEN 'bad_channel_value' WHEN 7 THEN 'unknown_target'
            ELSE 'ok' END AS cls, COUNT(*) AS n
        FROM events GROUP BY cls""",
    # ex_multimodal_features: the engine round-trips document bytes through
    # a real RIFF/WAVE encode→decode; the oracle recomputes the decoded
    # features straight from the (ASCII) text bytes.
    "ex_multimodal_features": """
        WITH b AS (SELECT doc_id,
            list_transform(range(1, length(text) + 1),
                           i -> ascii(substr(text, CAST(i AS INT), 1))) AS bs
            FROM documents)
        SELECT doc_id, 'audio' AS modality,
               CAST(len(bs) AS BIGINT) AS n_units,
               CAST(8000 AS INTEGER) AS sample_rate,
               CAST(1 AS INTEGER) AS channels,
               CAST(list_aggregate(bs, 'sum') AS BIGINT) AS sum_val,
               CAST(list_aggregate(bs, 'max') AS INTEGER) AS peak_val,
               round(CAST(list_aggregate(bs, 'sum') AS DOUBLE) / len(bs), 4) AS mean_val
        FROM b""",
    # ex_multimodal_resize: strided 8x8 thumbnail — the oracle rebuilds the
    # identical byte selection in text space (ASCII payloads) and md5s it.
    "ex_multimodal_resize": """
        WITH d AS (SELECT doc_id, text, length(text) // 64 AS step
                   FROM documents WHERE length(text) >= 64)
        SELECT doc_id, CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
               md5(string_agg(substr(text, CAST(i * step AS INT) + 1, 1), ''
                              ORDER BY i)) AS thumb_md5
        FROM d, UNNEST(range(0, 64)) AS t(i)
        GROUP BY doc_id""",
    # perceptual near-dup oracles: the engine round-trips through REAL
    # BMP/WAV containers; the containers are lossless on the synthesized
    # grids (unit-tested), so the oracle re-derives pixels/samples from
    # the text and replays the integer-exact bits/bands/Hamming pipeline.
    "ex_image_neardup": f"""
        WITH {_IMG_DHASH_CTES},
        {_HAM_CAND_CTE}
        {_ham_verify_select('doc_id_a', 'doc_id_b', C.IMG_HAM_MAX)}""",
    # the correlated form the Spark plan decorrelates: one row per sole
    # late (supplier, order) via EXISTS (another supplier on the order)
    # AND NOT EXISTS (another LATE supplier on the order); numwait counts
    # DISTINCT orders so duplicate late lines of one supplier count once
    "ex_waiting_orders": """
        SELECT s.s_suppkey, s.s_name,
               CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS numwait
        FROM supplier s, lineitem l1, orders o
        WHERE s.s_suppkey = l1.l_suppkey
          AND o.o_orderkey = l1.l_orderkey
          AND o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o.o_orderdate
                                                + INTERVAL 60 DAY)
        GROUP BY 1, 2""",
    # the audio-neardup chain + recursive connected components + the
    # drop-set anti join (the same dedup_apply tail as the image chain)
    "ex_audio_dedup_apply": f"""
        WITH RECURSIVE {_AUD_ENVELOPE_CTES},
        {_HAM_CAND_CTE},
        {_ham_pairs_cte(C.AUD_HAM_MAX)},
        {_CC_APPLY_EPILOGUE}""",
    # the video shared-keyframe chain + the same CC/apply tail
    "ex_video_dedup_apply": f"""
        WITH RECURSIVE {_VID_FRAME_CTES},
        pairs AS (SELECT a.doc_id AS da, b.doc_id AS db
                  FROM fr a JOIN rare USING (h)
                  JOIN fr b ON a.h = b.h AND a.doc_id < b.doc_id
                  GROUP BY 1, 2
                  HAVING count(*) >= {C.VID_SHARED_FRAMES}),
        {_CC_APPLY_EPILOGUE}""",
    # the image chain with the INCREMENTAL candidate rule: new-batch
    # (doc_id % 10 == 0) bands join the corpus store only
    "ex_image_neardup_incr": f"""
        WITH {_IMG_DHASH_CTES},
        cand AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
                 FROM bands a JOIN bands b
                   ON a.band = b.band AND a.val = b.val
                 WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0)
        {_ham_verify_select('doc_new', 'doc_old', C.IMG_HAM_MAX)}""",
    # the image-neardup chain with bucket_bands=2 candidates: two adjacent
    # bands form one bucket keyed by the band-ordered value concatenation
    # (exactly hamming_neardup's grouped-bucket rule)
    "ex_image_neardup_wide": f"""
        WITH {_IMG_DHASH_CTES},
        gb AS (SELECT doc_id, CAST(band // 2 AS INT) AS grp,
                      string_agg(CAST(val AS VARCHAR), ',' ORDER BY band) AS key
               FROM bands GROUP BY 1, 2),
        cand AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
                 FROM gb a JOIN gb b
                   ON a.grp = b.grp AND a.key = b.key AND a.doc_id < b.doc_id)
        {_ham_verify_select('doc_id_a', 'doc_id_b', C.IMG_HAM_MAX)}""",
    # the image-neardup hash/band/hamming chain + recursive connected
    # components + the drop-set anti join (the dedup_apply tail)
    "ex_image_dedup_apply": f"""
        WITH RECURSIVE {_IMG_DHASH_CTES},
        {_HAM_CAND_CTE},
        {_ham_pairs_cte(C.IMG_HAM_MAX)},
        {_CC_APPLY_EPILOGUE}""",
    "ex_video_neardup": f"""
        WITH {_VID_FRAME_CTES}
        SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM fr a JOIN rare USING (h)
        JOIN fr b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING count(*) >= {C.VID_SHARED_FRAMES}""",
    "ex_audio_neardup": f"""
        WITH {_AUD_ENVELOPE_CTES},
        {_HAM_CAND_CTE}
        {_ham_verify_select('doc_id_a', 'doc_id_b', C.AUD_HAM_MAX)}""",
    # --- round 2 additions ---
    "ex_dedup_clusters": f"""
WITH RECURSIVE {_SHINGLES},
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
j AS (SELECT da, db FROM inter JOIN sizes sa ON sa.doc_id = da
      JOIN sizes sb ON sb.doc_id = db
      WHERE round(i * 1.0 / (sa.n + sb.n - i), 6) >= {C.JACCARD_THRESHOLD}),
edges AS (SELECT da AS u, db AS v FROM j UNION ALL SELECT db, da FROM j),
reach(node, r) AS (
    SELECT u, u FROM edges
    UNION
    SELECT e.u, rr.r FROM edges e JOIN reach rr ON rr.node = e.v
)
SELECT node AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
FROM reach GROUP BY node""",
    "ex_skew_join": """
        WITH p AS (SELECT CASE WHEN l_orderkey % 25 < 20 THEN 0
                          ELSE l_orderkey % 25 END AS skew_key, l_quantity
                   FROM lineitem)
        SELECT skew_key, n_name, COUNT(*) AS n,
               ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM p JOIN nation ON skew_key = n_nationkey
        GROUP BY skew_key, n_name""",
    "ex_correlated_min": """SELECT o_custkey, o_orderkey,
        ROUND(o_totalprice, 2) AS price
        FROM orders o
        WHERE o_totalprice = (SELECT MIN(o2.o_totalprice) FROM orders o2
                              WHERE o2.o_custkey = o.o_custkey)""",
    # temperature-scaled mixture: replay the sqrt-weight / rounded-rate /
    # md5-bucket acceptance pipeline exactly (9-dp rounding keeps the float
    # path engine-portable, same discipline as the kmeans trajectory)
    "ex_domain_mix": """
        WITH per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
                     FROM documents GROUP BY source),
        tot AS (SELECT sum(sqrt(CAST(n_docs AS DOUBLE))) AS z,
                       CAST(sum(n_docs) AS BIGINT) AS n_total FROM per),
        rates AS (SELECT source, n_docs, p,
                         round(least(1.0, (p * n_total * 0.5) / n_docs), 9) AS rate
                  FROM (SELECT source, n_docs,
                               round(sqrt(CAST(n_docs AS DOUBLE)) / z, 9) AS p,
                               n_total
                        FROM per, tot)),
        acc AS (SELECT d.source FROM documents d JOIN rates r USING (source)
                WHERE CAST(concat('0x', substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))
                           AS BIGINT) % 10000 < floor(r.rate * 10000)),
        s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_sampled
              FROM acc GROUP BY source)
        SELECT r.source, r.n_docs, round(r.p, 6) AS mix_weight,
               CAST(floor(r.rate * 10000) AS BIGINT) AS accept_buckets,
               CAST(coalesce(s.n_sampled, 0) AS BIGINT) AS n_sampled
        FROM rates r LEFT JOIN s USING (source)""",
    "ex_stratified_sample": """SELECT doc_id, lang, source FROM documents
        WHERE CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                   AS BIGINT) % 100
              < CASE WHEN lang = 'en' THEN 10 ELSE 50 END""",
    "ex_hash_split": """WITH b AS (
            SELECT lang,
                   CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                        AS BIGINT) % 100 AS bk
            FROM documents)
        SELECT CASE WHEN bk < 5 THEN 'test' WHEN bk < 95 THEN 'train'
               ELSE 'val' END AS split, lang, CAST(count(*) AS BIGINT) AS n
        FROM b GROUP BY 1, 2""",
    "ex_pack_sequences": f"""
        WITH t AS (SELECT doc_id, source,
                   CAST(len({_TOKS.format(t='text')}) AS BIGINT) AS n_tok
                   FROM documents)
        SELECT doc_id, source, n_tok,
               CAST(FLOOR((SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id)
                           - n_tok) / 4096.0) AS BIGINT) AS bin_id
        FROM t""",
    "ex_decontaminate_apply": f"""
WITH {_SHINGLES},
b AS (SELECT DISTINCT s FROM sh JOIN documents USING (doc_id)
      WHERE source = 'src0'),
t AS (SELECT sh.doc_id, sh.s FROM sh JOIN documents USING (doc_id)
      WHERE source <> 'src0'),
drops AS (SELECT doc_id FROM t JOIN b USING (s) GROUP BY doc_id
          HAVING count(*) >= {C.DECON_MIN_SHARED})
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE source <> 'src0' AND doc_id NOT IN (SELECT doc_id FROM drops)
GROUP BY source""",
    "ex_decontaminate": f"""
WITH {_SHINGLES},
b AS (SELECT DISTINCT s FROM sh JOIN documents USING (doc_id)
      WHERE source = 'src0'),
t AS (SELECT sh.doc_id, sh.s FROM sh JOIN documents USING (doc_id)
      WHERE source <> 'src0')
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
FROM t JOIN b USING (s) GROUP BY doc_id""",
    "ex_label_centroids": """WITH per AS (
            SELECT label, CAST(i AS INT) AS dim,
                   avg(CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE)) AS m_raw
            FROM embeddings, UNNEST(range(len(embedding))) AS t(i)
            GROUP BY 1, 2)
        SELECT label, dim, round(m_raw, 6) AS m,
               round(sqrt(sum(m_raw * m_raw) OVER (PARTITION BY label)), 6)
                   AS centroid_norm
        FROM per""",
    # --- round 3 additions ---
    "ex_pii_scrub": f"""
        WITH a AS (SELECT doc_id,
                   concat(text, ' contact user', CAST(doc_id AS VARCHAR),
                          '@testmail.org ref ',
                          CAST(doc_id + 1000000 AS VARCHAR)) AS t
                   FROM documents),
        s AS (SELECT doc_id, t,
              regexp_replace(t, '{C.PII_EMAIL_RE}', '<EMAIL>', 'g') AS ne
              FROM a)
        SELECT doc_id,
               CAST(len(regexp_extract_all(t, '{C.PII_EMAIL_RE}')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(ne, '{C.PII_NUMBER_RE}')) AS BIGINT) AS n_numbers,
               CAST(length(regexp_replace(ne, '{C.PII_NUMBER_RE}', '<NUM>', 'g')) AS BIGINT) AS clean_len,
               md5(regexp_replace(ne, '{C.PII_NUMBER_RE}', '<NUM>', 'g')) AS clean_md5
        FROM s""",
    # streaming stateless form of the same gate: passing docs only
    "st_quality_gate": f"""
        WITH t AS (SELECT doc_id, unnest({_TOKS.format(t='text')}) AS tok FROM documents),
        pt AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY 1, 2),
        s AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                     CAST(count(*) AS BIGINT) AS n_distinct,
                     CAST(max(c) AS BIGINT) AS top_n,
                     CAST(sum(length(tok) * c) AS BIGINT) AS char_sum
              FROM pt GROUP BY 1)
        SELECT doc_id, n_tokens,
               round(1.0 - n_distinct * 1.0 / n_tokens, 4) AS dup_frac,
               round(top_n * 1.0 / n_tokens, 4) AS top_frac,
               round(char_sum * 1.0 / n_tokens, 4) AS mean_len
        FROM s
        WHERE n_tokens >= {C.QF_MIN_TOKENS}
          AND round(top_n * 1.0 / n_tokens, 4) <= {C.QF_MAX_TOP_FRAC}
          AND round(char_sum * 1.0 / n_tokens, 4) >= {C.QF_MIN_MEAN_LEN}
          AND round(char_sum * 1.0 / n_tokens, 4) <= {C.QF_MAX_MEAN_LEN}""",
    "ex_quality_filter": f"""
        WITH t AS (SELECT doc_id, unnest({_TOKS.format(t='text')}) AS tok FROM documents),
        pt AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY 1, 2),
        s AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                     CAST(count(*) AS BIGINT) AS n_distinct,
                     CAST(max(c) AS BIGINT) AS top_n,
                     CAST(sum(length(tok) * c) AS BIGINT) AS char_sum
              FROM pt GROUP BY 1)
        SELECT doc_id, n_tokens,
               round(1.0 - n_distinct * 1.0 / n_tokens, 4) AS dup_frac,
               round(top_n * 1.0 / n_tokens, 4) AS top_frac,
               round(char_sum * 1.0 / n_tokens, 4) AS mean_len,
               (n_tokens >= {C.QF_MIN_TOKENS}
                AND round(top_n * 1.0 / n_tokens, 4) <= {C.QF_MAX_TOP_FRAC}
                AND round(char_sum * 1.0 / n_tokens, 4) >= {C.QF_MIN_MEAN_LEN}
                AND round(char_sum * 1.0 / n_tokens, 4) <= {C.QF_MAX_MEAN_LEN}) AS keep
        FROM s""",
    "ex_vocab": f"""
        WITH t AS (SELECT unnest({_TOKS.format(t='text')}) AS token FROM documents)
        SELECT token, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY token
        ORDER BY n DESC, token LIMIT {C.VOCAB_TOP_K}""",
    "ex_dedup_apply": f"""
WITH RECURSIVE {_SHINGLES},
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
pairs AS (SELECT da, db FROM inter JOIN sizes sa ON sa.doc_id = da
      JOIN sizes sb ON sb.doc_id = db
      WHERE round(i * 1.0 / (sa.n + sb.n - i), 6) >= {C.JACCARD_THRESHOLD}),
{_CC_APPLY_EPILOGUE}""",
    "ex_ann_recall": f"""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        p AS (SELECT a.vec_id, b.vec_id AS neighbor_id, {_cos('a.e', 'b.e')} AS cos
              FROM v a JOIN v b ON b.vec_id <> a.vec_id WHERE a.vec_id < {C.ANN_QUERY_MAX_ID}),
        bp AS (SELECT vec_id, neighbor_id FROM (
               SELECT vec_id, neighbor_id,
                      row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rnk
               FROM p) WHERE rnk <= {C.ANN_TOPK}),
        b AS (SELECT vec_id, e,
              CAST({' + '.join(f'(CASE WHEN e[{i + 1}] > 0 THEN {2**i} ELSE 0 END)' for i in range(8))}
                   AS BIGINT) AS bucket FROM v),
        pr AS (SELECT vec_id, e,
               unnest([bucket, {', '.join(f'xor(bucket, {2**i})' for i in range(8))}]) AS pb
               FROM b WHERE vec_id < {C.ANN_QUERY_MAX_ID}),
        lpp AS (SELECT a.vec_id, n.vec_id AS neighbor_id, {_cos('a.e', 'n.e')} AS cos
                FROM pr a JOIN b n ON a.pb = n.bucket AND a.vec_id <> n.vec_id),
        lp AS (SELECT vec_id, neighbor_id FROM (
               SELECT vec_id, neighbor_id,
                      row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rnk
               FROM lpp) WHERE rnk <= {C.ANN_TOPK}),
        h AS (SELECT bp.vec_id, count(*) AS h
              FROM bp JOIN lp ON bp.vec_id = lp.vec_id AND bp.neighbor_id = lp.neighbor_id
              GROUP BY 1)
        SELECT q.vec_id, CAST(coalesce(h.h, 0) AS BIGINT) AS n_hits,
               round(coalesce(h.h, 0) * 1.0 / {C.ANN_TOPK}, 4) AS recall
        FROM (SELECT vec_id FROM v WHERE vec_id < {C.ANN_QUERY_MAX_ID}) q
        LEFT JOIN h ON q.vec_id = h.vec_id""",
    "ex_embed_quantize": f"""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        s AS (SELECT vec_id, e,
              list_max(list_transform(e, x -> abs(x))) / {C.QUANT_LEVELS}.0 AS scale
              FROM v),
        q AS (SELECT vec_id, scale,
              CASE WHEN scale > 0
                   THEN list_transform(e, x -> CAST(floor(x / scale + 0.5) AS BIGINT))
                   ELSE list_transform(e, x -> CAST(0 AS BIGINT)) END AS ql
              FROM s)
        SELECT vec_id, round(scale, 6) AS scale,
               list_reduce(list_prepend(CAST(0 AS BIGINT), ql), (a, b) -> a + b) AS sum_q,
               list_min(ql) AS min_q, list_max(ql) AS max_q
        FROM q""",
    # mirror of dedup.dup_spans: same tokenizer, md5(span text) hash, and
    # doc_id*BASE+pos first-occurrence order
    "ex_dup_spans": f"""
        WITH t AS (SELECT doc_id, {_TOKS.format(t='text')} AS toks FROM documents),
        sp AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
                      md5(array_to_string(
                          list_slice(toks, CAST(i AS INT), CAST(i AS INT) + {C.SPAN_TOKENS - 1}),
                          ' ')) AS h
               FROM t, UNNEST(range(1, len(toks) - {C.SPAN_TOKENS} + 2)) AS u(i)
               WHERE len(toks) >= {C.SPAN_TOKENS}),
        g AS (SELECT doc_id, pos, h,
                     count(*) OVER (PARTITION BY h) AS cnt,
                     min(doc_id * {C.SPAN_ORD_BASE} + pos) OVER (PARTITION BY h) AS mn
              FROM sp)
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_spans,
               CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
               CAST(sum(CASE WHEN doc_id * {C.SPAN_ORD_BASE} + pos <> mn THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_cut,
               round(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) / count(*), 4) AS dup_ratio
        FROM g GROUP BY doc_id""",
    # dup_spans_apply: same span table / first-occurrence rule as
    # ex_dup_spans; cut positions fan out ×span, tokens anti-join them,
    # and the rewritten content is value-checked via an ORDER BY-ed
    # string_agg md5 (coalesced to md5('') for fully-cut docs, matching
    # Spark's concat_ws over an empty kept set)
    "ex_dedup_substring": f"""
        WITH t AS (SELECT doc_id, {_TOKS.format(t='text')} AS toks FROM documents),
        sp AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
                      md5(array_to_string(
                          list_slice(toks, CAST(i AS INT), CAST(i AS INT) + {C.SPAN_TOKENS - 1}),
                          ' ')) AS h
               FROM t, UNNEST(range(1, len(toks) - {C.SPAN_TOKENS} + 2)) AS u(i)
               WHERE len(toks) >= {C.SPAN_TOKENS}),
        g AS (SELECT doc_id, pos,
                     min(doc_id * {C.SPAN_ORD_BASE} + pos) OVER (PARTITION BY h) AS mn
              FROM sp),
        cutpos AS (SELECT DISTINCT doc_id, pos + CAST(o AS BIGINT) AS tp
                   FROM g, UNNEST(range({C.SPAN_TOKENS})) u(o)
                   WHERE doc_id * {C.SPAN_ORD_BASE} + pos <> mn),
        tok AS (SELECT doc_id, CAST(i AS BIGINT) AS tp, toks[CAST(i AS INT)] AS tok
                FROM t, UNNEST(range(1, len(toks) + 1)) u(i)
                WHERE length(toks[CAST(i AS INT)]) > 0),
        totals AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens
                   FROM tok GROUP BY 1),
        kept AS (SELECT tok.* FROM tok ANTI JOIN cutpos USING (doc_id, tp)),
        ka AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
                      md5(string_agg(tok, ' ' ORDER BY tp)) AS kept_md5
               FROM kept GROUP BY 1)
        SELECT totals.doc_id, totals.n_tokens,
               totals.n_tokens - coalesce(ka.n_kept, 0) AS n_removed,
               coalesce(ka.kept_md5, md5('')) AS kept_md5
        FROM totals LEFT JOIN ka USING (doc_id)""",
    "ex_kmeans": _kmeans_sql(),
    "ex_bpe_train": _bpe_sql(),
    "ex_bpe_encode": _bpe_encode_sql(),
    "ex_bpe_fertility": _bpe_fertility_sql(),
    "ex_ann_ivf_trained": _ann_ivf_trained_sql(),
    "ex_ann_pq": _ann_pq_sql(),
    "ex_ann_ivfpq": _ann_ivfpq_sql(),
    "ex_semdedup": _semdedup_sql(),
    "ex_semdedup_apply": _semdedup_apply_sql(),
    "ex_pagerank": _pagerank_sql(),
    "ex_label_prop": _label_prop_sql(),
    # hourly z-score anomaly flags: exact integer sums divided once, so
    # the z-scores agree bit-for-bit; filter applies to the ROUNDED z.
    # st_anomaly drains the same hourly table from the stream first, so
    # both entries share this oracle verbatim (assigned below the dict).
    "ex_anomaly": """
        WITH h AS (SELECT event_type,
                          date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
                          CAST(count(*) AS BIGINT) AS n
                   FROM events GROUP BY 1, 2),
        s AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS sn,
                     CAST(sum(n * n) AS BIGINT) AS sn2,
                     CAST(count(*) AS BIGINT) AS c
              FROM h GROUP BY 1),
        j AS (SELECT h.event_type, h.hr, h.n,
                     sn * 1.0 / c AS m,
                     sqrt(greatest(sn2 * 1.0 / c - (sn * 1.0 / c) * (sn * 1.0 / c),
                                   0.0)) AS sd
              FROM h JOIN s ON s.event_type = h.event_type)
        SELECT event_type, hr, n, round(m, 4) AS mean_n,
               round(CASE WHEN sd = 0.0 THEN 0.0 ELSE (n - m) / sd END, 4) AS z
        FROM j
        WHERE abs(round(CASE WHEN sd = 0.0 THEN 0.0 ELSE (n - m) / sd END, 4)) > 2.0""",
    # z-normalized subsequence search: folds are sequential left-to-right
    # in both engines (list_reduce == F.aggregate with 0.0 init, since
    # 0.0 + x1 == x1 exactly), so distances agree bit-for-bit pre-round
    "ex_ts_similarity": f"""
        WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
                   FROM events),
        w AS (SELECT user_id, event_id AS start_event_id,
                     list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS BETWEEN CURRENT ROW
                                       AND {C.TSS_W - 1} FOLLOWING) AS arr
              FROM e),
        f AS (SELECT * FROM w WHERE len(arr) = {C.TSS_W}),
        z AS (SELECT user_id, start_event_id, arr,
                     list_reduce(arr, (a, b) -> a + b) / {C.TSS_W}.0 AS m,
                     list_reduce(list_transform(arr, x -> x * x),
                                 (a, b) -> a + b) / {C.TSS_W}.0 AS ex2
              FROM f),
        zz AS (SELECT user_id, start_event_id,
                      CASE WHEN sqrt(greatest(ex2 - m * m, 0.0)) = 0.0
                           THEN list_transform(arr, x -> 0.0)
                           ELSE list_transform(arr,
                                x -> (x - m) / sqrt(greatest(ex2 - m * m, 0.0)))
                      END AS zarr
               FROM z),
        q AS (SELECT zarr AS qz FROM zz WHERE user_id = {C.TSS_QUERY_USER}
              ORDER BY start_event_id LIMIT 1)
        SELECT user_id, start_event_id,
               round(sqrt(list_reduce(list_transform(range(1, {C.TSS_W + 1}),
                          i -> (zarr[i] - qz[i]) * (zarr[i] - qz[i])),
                          (a, b) -> a + b)), 6) AS dist
        FROM zz CROSS JOIN q
        ORDER BY dist, user_id, start_event_id LIMIT {C.TSS_TOPK}""",
    # fixed-anchor largest-triangle downsampling: same bucket assignment
    # (integer div), 6-dp anchor means, LTTB_AREA_ROUND-dp areas, and the
    # (k1, k2, k3) selection key as the Spark min-struct argmax
    "ex_downsample": f"""
        WITH e AS (SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS xu,
                          value AS y FROM events),
        bo AS (SELECT min(xu) AS mn, max(xu) AS mx FROM e),
        p AS (SELECT event_id, xu - mn AS x_us, y,
                     CAST(least(((xu - mn) * {C.LTTB_BUCKETS}) // greatest(mx - mn, 1),
                                {C.LTTB_BUCKETS - 1}) AS BIGINT) AS b
              FROM e CROSS JOIN bo),
        a AS (SELECT b, round(avg(CAST(x_us AS DOUBLE) / 1000000.0), 6) AS ax,
                     round(avg(CAST(y AS DOUBLE)), 6) AS ay
              FROM p GROUP BY b),
        al AS (SELECT b,
                      lag(ax) OVER (ORDER BY b) AS lx, lag(ay) OVER (ORDER BY b) AS ly,
                      lead(ax) OVER (ORDER BY b) AS rx, lead(ay) OVER (ORDER BY b) AS ry
               FROM a),
        c AS (SELECT p.b, p.event_id, p.x_us, p.y,
                     CASE WHEN al.lx IS NULL OR al.rx IS NULL THEN NULL
                          ELSE round(abs((al.lx - al.rx) * (p.y - al.ly)
                                         - (al.lx - CAST(p.x_us AS DOUBLE) / 1000000.0)
                                           * (al.ry - al.ly)) * 0.5,
                                     {C.LTTB_AREA_ROUND}) END AS area,
                     al.lx IS NULL AS ef, al.rx IS NULL AS el
              FROM p JOIN al ON al.b = p.b),
        k AS (SELECT b, event_id, x_us, y, area,
                     CASE WHEN ef OR el THEN 0.0 ELSE -area END AS k1,
                     CASE WHEN ef THEN x_us WHEN el THEN -x_us ELSE x_us END AS k2,
                     CASE WHEN ef THEN event_id WHEN el THEN -event_id
                          ELSE event_id END AS k3,
                     count(*) OVER (PARTITION BY b) AS np
              FROM c),
        r AS (SELECT b, event_id, x_us, y, area, np,
                     row_number() OVER (PARTITION BY b ORDER BY k1, k2, k3) AS rn
              FROM k)
        SELECT b AS bucket, event_id, x_us, round(y, 6) AS y,
               coalesce(area, 0.0) AS area, CAST(np AS BIGINT) AS n_points
        FROM r WHERE rn = 1""",
    # exact heavy hitters: the Spark side's Misra-Gries pass only proposes
    # candidates; the emitted rows are the exact count > total/k set
    "ex_heavy_hitters": f"""
        WITH t AS (SELECT unnest({_TOKS.format(t='text')}) AS token FROM documents),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM t),
        g AS (SELECT token, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY token)
        SELECT token, n, round(n * 1.0 / total, 6) AS share
        FROM g CROSS JOIN tot WHERE n * {C.HH_K} > total""",
    # hashed-feature linear quality model: per-token integer weights
    # summed exactly (BIGINT), one final division pair — bit-identical to
    # the Spark array fold with no rounding tolerance
    "ex_quality_model": f"""
        WITH t0 AS (SELECT doc_id, unnest({_TOKS.format(t='text')}) AS tok
                    FROM documents),
        t AS (SELECT doc_id, tok FROM t0 WHERE length(tok) > 0),
        w AS (SELECT doc_id,
                     ((CAST(concat('0x', substring(md5(tok), 1, 15)) AS BIGINT)
                       % {C.QM_MOD}) * {C.QM_MULT}) % {C.QM_MOD}
                     - {(C.QM_MOD - 1) // 2} AS wt
              FROM t)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(CAST(sum(wt) AS BIGINT) AS DOUBLE) / {float(C.QM_MOD)}
                   / CAST(count(*) AS DOUBLE) AS model_score
        FROM w GROUP BY doc_id""",
    # exact order statistics — the Spark side's summaries only narrow the
    # candidate interval, so the plain sorted-rank answer is the oracle.
    # target_rank = ceil(pct*n/100) in INTEGER arithmetic on both engines
    # (double ceil(0.01*n) is off-by-one bait).
    # the HDR chain per group: identical bucketing, grouped extraction
    "ex_hdr_quantile_grouped": f"""
        WITH v AS (SELECT event_type AS grp,
                   CAST(CASE WHEN value >= 0
                       THEN floor(value * {C.HDR_SCALE} + 0.5)
                       ELSE -floor(-(value) * {C.HDR_SCALE} + 0.5) END
                   AS BIGINT) AS x
                   FROM events WHERE value IS NOT NULL),
        pos AS (SELECT grp, x FROM v WHERE x >= 1),
        bk AS (SELECT grp,
                      greatest(0, length(bin(x)) - 1 - {C.HDR_SUB_BITS}) AS shift,
                      x >> greatest(0, length(bin(x)) - 1 - {C.HDR_SUB_BITS}) AS top,
                      count(*) AS w
               FROM pos GROUP BY 1, 2, 3),
        ord AS (SELECT grp, (top << shift) AS lb, w FROM bk),
        cum AS (SELECT grp, lb,
                       sum(w) OVER (PARTITION BY grp ORDER BY lb
                                    ROWS UNBOUNDED PRECEDING) AS cum
                FROM ord),
        tot AS (SELECT grp, CAST(sum(w) AS BIGINT) AS n FROM ord GROUP BY grp),
        tr AS (SELECT grp, pct, n,
                      CAST((pct * n + 99) // 100 AS BIGINT) AS target_rank
               FROM (SELECT unnest([{", ".join(str(p) for p in C.SKQ_PCTS)}])
                         AS pct), tot)
        SELECT tr.grp, tr.pct, tr.n, tr.target_rank,
               CAST(min(CASE WHEN c.cum >= tr.target_rank THEN c.lb END)
                    AS BIGINT) AS bucket_lb,
               CAST(min(CASE WHEN c.cum >= tr.target_rank THEN c.lb END)
                    AS DOUBLE) / {C.HDR_SCALE} AS est
        FROM tr JOIN cum c ON c.grp = tr.grp
        GROUP BY 1, 2, 3, 4""",
    # HDR log-bucket sketch: integer quantize -> (shift, top) bucket
    # counts -> cumulative-rank extraction, all exact integer arithmetic
    # (bin() is minimal-length in both engines; the only double is the
    # final descale divide, the same IEEE op on both sides)
    "ex_hdr_quantile": f"""
        WITH v AS (SELECT CAST(CASE WHEN value >= 0
                       THEN floor(value * {C.HDR_SCALE} + 0.5)
                       ELSE -floor(-(value) * {C.HDR_SCALE} + 0.5) END
                   AS BIGINT) AS x
                   FROM events WHERE value IS NOT NULL),
        pos AS (SELECT x FROM v WHERE x >= 1),
        bk AS (SELECT greatest(0, length(bin(x)) - 1 - {C.HDR_SUB_BITS}) AS shift,
                      x >> greatest(0, length(bin(x)) - 1 - {C.HDR_SUB_BITS}) AS top,
                      count(*) AS w
               FROM pos GROUP BY 1, 2),
        ord AS (SELECT (top << shift) AS lb, w FROM bk),
        cum AS (SELECT lb, sum(w) OVER (ORDER BY lb ROWS UNBOUNDED PRECEDING)
                       AS cum FROM ord),
        tot AS (SELECT CAST(sum(w) AS BIGINT) AS n FROM ord),
        tr AS (SELECT pct, n,
                      CAST((pct * n + 99) // 100 AS BIGINT) AS target_rank
               FROM (SELECT unnest([{", ".join(str(p) for p in C.SKQ_PCTS)}])
                         AS pct), tot)
        SELECT tr.pct, tr.n, tr.target_rank,
               CAST(min(CASE WHEN c.cum >= tr.target_rank THEN c.lb END)
                    AS BIGINT) AS bucket_lb,
               CAST(min(CASE WHEN c.cum >= tr.target_rank THEN c.lb END)
                    AS DOUBLE) / {C.HDR_SCALE} AS est
        FROM tr, cum c GROUP BY 1, 2, 3""",
    "ex_sketch_quantile": f"""
        WITH v AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem
                   WHERE l_extendedprice IS NOT NULL),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
        p(pct) AS (VALUES {', '.join(f'({int(p)})' for p in C.SKQ_PCTS)}),
        r AS (SELECT pct, nn.n,
                     CAST((pct * nn.n + 99) // 100 AS BIGINT) AS target_rank
              FROM p CROSS JOIN nn),
        s AS (SELECT x, row_number() OVER (ORDER BY x) AS rn FROM v)
        SELECT r.pct, r.n, r.target_rank, s.x AS value
        FROM r JOIN s ON s.rn = r.target_rank""",
    "ex_funnel": """
        WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        fc AS (SELECT user_id, min(ts) AS c_ts FROM e WHERE event_type = 'click' GROUP BY 1),
        fp AS (SELECT DISTINCT e.user_id FROM e JOIN fc ON fc.user_id = e.user_id
               WHERE e.event_type = 'purchase'
                 AND e.ts >= fc.c_ts AND e.ts <= fc.c_ts + INTERVAL 1 HOUR),
        c AS (SELECT CAST(count(*) AS BIGINT) AS n_clickers FROM fc),
        v AS (SELECT CAST(count(*) AS BIGINT) AS n_converted FROM fp)
        SELECT n_clickers, n_converted,
               round(n_converted * 1.0 / n_clickers, 4) AS conv_rate
        FROM c CROSS JOIN v""",
    # gap-based session assignment written out as lag + cumulative sum;
    # the session-merge rule mirrors Spark's session_window boundary
    # pinned by test: a gap of EXACTLY the 30-min duration still merges,
    # so a NEW session starts only when gap > 1800s (integer micros)
    "ex_session_funnel": """
        WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
        g AS (SELECT user_id, event_type, t,
                     CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
                              > 1800000000
                            OR lag(t) OVER (PARTITION BY user_id ORDER BY t)
                              IS NULL
                          THEN 1 ELSE 0 END AS new_s
              FROM e),
        s AS (SELECT user_id, event_type, t,
                     sum(new_s) OVER (PARTITION BY user_id ORDER BY t
                         ROWS UNBOUNDED PRECEDING) AS sid
              FROM g),
        per AS (SELECT user_id, sid,
                       min(CASE WHEN event_type = 'click' THEN t END)
                           AS first_click,
                       max(CASE WHEN event_type = 'purchase' THEN t END)
                           AS last_purchase
                FROM s GROUP BY 1, 2)
        SELECT CAST(count(*) AS BIGINT) AS n_sessions,
               CAST(sum(CASE WHEN first_click IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_click_sessions,
               CAST(sum(CASE WHEN first_click IS NOT NULL
                              AND last_purchase >= first_click
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
               round(sum(CASE WHEN first_click IS NOT NULL
                               AND last_purchase >= first_click
                              THEN 1 ELSE 0 END) * 1.0
                     / sum(CASE WHEN first_click IS NOT NULL
                                THEN 1 ELSE 0 END), 4) AS conv_rate
        FROM per""",
    "ex_retention": """
        WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        fs AS (SELECT user_id, date_trunc('hour', min(ts)) AS cohort FROM e GROUP BY 1),
        nh AS (SELECT DISTINCT e.user_id FROM e JOIN fs ON fs.user_id = e.user_id
               WHERE date_trunc('hour', e.ts) = fs.cohort + INTERVAL 1 HOUR)
        SELECT fs.cohort, CAST(count(*) AS BIGINT) AS cohort_size,
               CAST(sum(CASE WHEN nh.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS retained,
               round(sum(CASE WHEN nh.user_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0
                     / count(*), 4) AS retention_rate
        FROM fs LEFT JOIN nh ON nh.user_id = fs.user_id
        GROUP BY fs.cohort""",
    "ex_retention_matrix": """
        WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        fs AS (SELECT user_id, date_trunc('hour', min(ts)) AS cohort
               FROM e GROUP BY 1),
        a AS (SELECT DISTINCT user_id, date_trunc('hour', ts) AS hr FROM e),
        po AS (SELECT fs.cohort,
                      CAST((epoch_us(a.hr) - epoch_us(fs.cohort)) // 3600000000
                           AS BIGINT) AS off,
                      CAST(count(*) AS BIGINT) AS active_users
               FROM a JOIN fs ON fs.user_id = a.user_id
               WHERE (epoch_us(a.hr) - epoch_us(fs.cohort)) // 3600000000
                     BETWEEN 0 AND 5
               GROUP BY 1, 2),
        sz AS (SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_size
               FROM fs GROUP BY 1)
        SELECT po.cohort, po.off, sz.cohort_size, po.active_users,
               round(po.active_users * 1.0 / sz.cohort_size, 4) AS rate
        FROM po JOIN sz ON sz.cohort = po.cohort""",
    "ex_normalize_text": f"""
        SELECT doc_id,
               CAST(length(trim(regexp_replace(
                   translate(lower(text), '{C.ACCENT_SRC}', '{C.ACCENT_DST}'),
                   '\\s+', ' ', 'g'))) AS BIGINT) AS norm_len,
               md5(trim(regexp_replace(
                   translate(lower(text), '{C.ACCENT_SRC}', '{C.ACCENT_DST}'),
                   '\\s+', ' ', 'g'))) AS norm_md5
        FROM documents""",
    "ex_bigram_logprob": f"""
        WITH {_BIGRAM_CTES}
        SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               round(-avg(ln(pr.p)), 4) AS bigram_logprob
        FROM bg JOIN pr ON pr.w1 = bg.w1 AND pr.w2 = bg.w2
        GROUP BY bg.doc_id""",
    # CCNet terciles: thresholds are exact DISCRETE quantiles over integer
    # micro-unit scores (4-dp LM score x PPL_SCALE) — ceil(n/3)-th and
    # ceil(2n/3)-th smallest, tie -> lower bucket; no float interpolation,
    # so both engines cut identically (queries.ex_perplexity_buckets)
    "ex_perplexity_buckets": f"""
        WITH {_BIGRAM_CTES},
        sc AS (SELECT bg.doc_id, round(-avg(ln(pr.p)), 4) AS bigram_logprob
               FROM bg JOIN pr ON pr.w1 = bg.w1 AND pr.w2 = bg.w2
               GROUP BY bg.doc_id),
        mu AS (SELECT doc_id, bigram_logprob,
                      CAST(round(bigram_logprob * {C.PPL_SCALE}) AS BIGINT) AS m
               FROM sc),
        cts AS (SELECT m, CAST(count(*) AS BIGINT) AS c FROM mu GROUP BY m),
        cm AS (SELECT m, sum(c) OVER (ORDER BY m ROWS UNBOUNDED PRECEDING) AS cum
               FROM cts),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM mu),
        thr AS (SELECT min(CASE WHEN cum >= (n + 2) // 3 THEN m END) AS t1,
                       min(CASE WHEN cum >= (2 * n + 2) // 3 THEN m END) AS t2
                FROM cm, nn)
        SELECT doc_id, bigram_logprob,
               CASE WHEN m <= t1 THEN 'head'
                    WHEN m <= t2 THEN 'middle'
                    ELSE 'tail' END AS ppl_bucket
        FROM mu, thr""",
    "ex_token_entropy": f"""
        WITH t AS (SELECT doc_id, unnest({_TOKS.format(t='text')}) AS tok FROM documents),
        pt AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS c FROM t
               WHERE length(tok) > 0 GROUP BY 1, 2),
        tot AS (SELECT doc_id, sum(c) AS n, CAST(count(*) AS BIGINT) AS nd
                FROM pt GROUP BY 1)
        SELECT pt.doc_id, CAST(tot.n AS BIGINT) AS n_tokens, tot.nd AS n_distinct,
               round(-sum((pt.c / tot.n) * ln(pt.c / tot.n)), 4) AS entropy,
               CASE WHEN tot.nd > 1 THEN
                 round(-sum((pt.c / tot.n) * ln(pt.c / tot.n))
                       / ln(CAST(tot.nd AS DOUBLE)), 4)
               END AS norm_entropy
        FROM pt JOIN tot USING (doc_id)
        GROUP BY pt.doc_id, tot.n, tot.nd""",
    # embed_gram's oracle materializes the full n×d² product space (fine at
    # oracle scale); the Spark side ships O(batches·d²) partial gramians.
    # Both engines quantize to integer EG_QUANT-ths (sign-aware half-away),
    # accumulate exact integers (HUGEINT here, decimal(38,0) there) and
    # derive the 6-dp value from ONE integral divide — bit-identical in
    # any partition/summation order (the r6 float-gramian hash fail).
    # The join key is the table's own vec_id (a row_number() OVER () key
    # relied on identical CTE-scan order across references — review
    # catch), and the 10⁶ output scale cancels one EG_QUANT factor so no
    # scaling multiply approaches the 38-digit cap.
    "ex_embed_gram": f"""
        WITH v AS (SELECT vec_id AS rid,
                          CAST(embedding AS DOUBLE[]) AS e
                   FROM embeddings WHERE embedding IS NOT NULL),
        cells AS (SELECT rid, CAST(i AS INT) AS dim,
                         CAST(CASE WHEN e[CAST(i AS INT) + 1] >= 0
                              THEN floor(e[CAST(i AS INT) + 1]
                                         * {C.EG_QUANT}.0 + 0.5)
                              ELSE -floor(-e[CAST(i AS INT) + 1]
                                          * {C.EG_QUANT}.0 + 0.5)
                              END AS HUGEINT) AS q
                  FROM v, UNNEST(range(len(e))) t(i)),
        g AS (SELECT a.dim AS dim_i, b.dim AS dim_j, sum(a.q * b.q) AS g
              FROM cells a JOIN cells b ON a.rid = b.rid AND b.dim >= a.dim
              GROUP BY 1, 2),
        s AS (SELECT dim, sum(q) AS s FROM cells GROUP BY 1),
        n AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM v)
        SELECT g.dim_i, g.dim_j,
               CAST(CASE WHEN n.n * g.g - si.s * sj.s >= 0
                    THEN (2 * (n.n * g.g - si.s * sj.s)
                          + n.n * n.n * {C.EG_QUANT})
                         // (2 * n.n * n.n * {C.EG_QUANT})
                    ELSE -((-2 * (n.n * g.g - si.s * sj.s)
                            + n.n * n.n * {C.EG_QUANT})
                           // (2 * n.n * n.n * {C.EG_QUANT}))
                    END AS DOUBLE) / 1e6 AS cov
        FROM g
        JOIN s si ON si.dim = g.dim_i
        JOIN s sj ON sj.dim = g.dim_j
        CROSS JOIN n""",
    "ex_cooccur": f"""
        WITH t AS (SELECT {_TOKS.format(t='text')} AS t FROM documents),
        pr AS (SELECT least(t[CAST(i AS INT)], t[CAST(i AS INT) + CAST(o AS INT)]) AS a,
                      greatest(t[CAST(i AS INT)], t[CAST(i AS INT) + CAST(o AS INT)]) AS b
               FROM t, UNNEST(range(1, len(t))) u(i),
                       UNNEST(range(1, {C.COOCCUR_WINDOW} + 1)) w(o)
               WHERE i + o <= len(t)),
        pc AS (SELECT a, b, count(*) AS c FROM pr
               WHERE length(a) > 0 AND length(b) > 0 GROUP BY 1, 2),
        uni AS (SELECT w, count(*) AS freq FROM
                (SELECT unnest({_TOKS.format(t='text')}) AS w FROM documents)
                WHERE length(w) > 0 GROUP BY w),
        np AS (SELECT CAST(sum(c) AS DOUBLE) AS np FROM pc),
        nt AS (SELECT CAST(sum(freq) AS DOUBLE) AS nt FROM uni)
        SELECT pc.a, pc.b, CAST(pc.c AS BIGINT) AS n_pair,
               round(ln((pc.c / np.np) / ((fa.freq / nt.nt) * (fb.freq / nt.nt))), 4) AS pmi
        FROM pc
        JOIN uni fa ON fa.w = pc.a
        JOIN uni fb ON fb.w = pc.b
        CROSS JOIN np CROSS JOIN nt
        ORDER BY n_pair DESC, a, b LIMIT {C.COOCCUR_TOP_K}""",
    "st_vocab": f"""
        WITH t AS (SELECT unnest({_TOKS.format(t='text')}) AS token FROM documents)
        SELECT token, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY token""",
    "ex_chunk_docs": f"""
        WITH s AS (SELECT doc_id, text,
                   unnest(range(0, length(text), {C.CHUNK_SIZE - C.CHUNK_OVERLAP})) AS st,
                   generate_subscripts(range(0, length(text), {C.CHUNK_SIZE - C.CHUNK_OVERLAP}), 1) - 1 AS cid
                   FROM documents)
        SELECT doc_id, CAST(cid AS BIGINT) AS chunk_id,
               CAST(st AS BIGINT) AS chunk_start,
               CAST(length(substr(text, CAST(st AS INT) + 1, {C.CHUNK_SIZE})) AS BIGINT) AS chunk_len,
               md5(substr(text, CAST(st AS INT) + 1, {C.CHUNK_SIZE})) AS chunk_md5
        FROM s""",
    "ex_unigram_logprob": f"""
        WITH t AS (SELECT doc_id, unnest({_TOKS.format(t='text')}) AS tok FROM documents),
        lm AS (SELECT tok, CAST(count(*) AS DOUBLE) AS c FROM t GROUP BY tok),
        tot AS (SELECT sum(c) AS tt FROM lm),
        p AS (SELECT tok, c / tt AS p FROM lm CROSS JOIN tot)
        SELECT doc_id, round(-avg(ln(p)), 4) AS logprob_score
        FROM t JOIN p USING (tok) GROUP BY doc_id""",
    # exact cross-set Jaccard: every (new=src0, old=rest) pair over the
    # threshold — the LSH path's miss probability at the corpus's >=0.8 dup
    # gap is ~8e-8 (common.py band config), same evidence as ex_neardup_minhash
    "ex_dedup_incremental": f"""
WITH {_SHINGLES},
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
          FROM sh a JOIN documents na ON na.doc_id = a.doc_id AND na.source = 'src0'
               JOIN sh b ON a.s = b.s
               JOIN documents nb ON nb.doc_id = b.doc_id AND nb.source <> 'src0'
          GROUP BY 1, 2),
j AS (SELECT da, db, round(i * 1.0 / (sa.n + sb.n - i), 6) AS jac
      FROM inter JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db)
SELECT da AS doc_new, db AS doc_old, jac AS jaccard
FROM j WHERE jac >= {C.JACCARD_THRESHOLD}""",
    "ex_dq_checks": """
        SELECT 'orders_pk_dups' AS chk,
               CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS violations
        FROM orders
        UNION ALL
        SELECT 'lineitem_fk_orphans', CAST(count(*) AS BIGINT) FROM lineitem
        WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
        UNION ALL
        SELECT 'orders_custkey_orphans', CAST(count(*) AS BIGINT) FROM orders
        WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
        UNION ALL
        SELECT 'orders_nonpositive_price', CAST(count(*) AS BIGINT) FROM orders
        WHERE o_totalprice <= 0
        UNION ALL
        SELECT 'customer_null_name', CAST(count(*) AS BIGINT) FROM customer
        WHERE c_name IS NULL""",
    "ex_key_skew": """
        WITH per AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1)
        SELECT CAST(count(*) AS BIGINT) AS n_keys,
               CAST(sum(n) AS BIGINT) AS n_rows,
               CAST(max(n) AS BIGINT) AS max_n,
               round(max(n) / avg(n), 4) AS skew_ratio,
               round(max(n) * 1.0 / sum(n), 6) AS top_share
        FROM per""",
    # ---- round-9 additions: remaining TPC-H shapes (exact-cents money,
    # micro-unit discounts, identical expression text to queries.py) ----
    "ex_pricing_summary": f"""
        WITH li AS (SELECT l_returnflag, l_linestatus,
               CAST(l_quantity AS BIGINT) AS q,
               {_cents_o('l_extendedprice')} AS price_c,
               {_cents_o('l_extendedprice * (1 - l_discount)')} AS disc_c,
               {_cents_o('l_extendedprice * (1 - l_discount) * (1 + l_tax)')}
                   AS charge_c,
               CAST(floor(l_discount * 1000000 + 0.5) AS BIGINT) AS disc_u
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00')
        SELECT l_returnflag, l_linestatus,
               CAST(sum(q) AS BIGINT) AS sum_qty,
               CAST(CAST(sum(price_c) AS HUGEINT) AS DOUBLE) / 100.0
                   AS sum_base_price,
               CAST(CAST(sum(disc_c) AS HUGEINT) AS DOUBLE) / 100.0
                   AS sum_disc_price,
               CAST(CAST(sum(charge_c) AS HUGEINT) AS DOUBLE) / 100.0
                   AS sum_charge,
               CAST(CAST(sum(q) AS HUGEINT) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS avg_qty,
               CAST(CAST(sum(price_c) AS HUGEINT) AS DOUBLE) / 100.0
                   / CAST(count(*) AS DOUBLE) AS avg_price,
               CAST(CAST(sum(disc_u) AS HUGEINT) AS DOUBLE) / 1000000.0
                   / CAST(count(*) AS DOUBLE) AS avg_disc,
               CAST(count(*) AS BIGINT) AS count_order
        FROM li GROUP BY 1, 2""",
    "ex_local_supplier_volume": f"""
        WITH li AS (SELECT l_orderkey, l_suppkey,
               {_cents_o('l_extendedprice * (1 - l_discount)')} AS cents
            FROM lineitem)
        SELECT n_name, CAST(count(*) AS BIGINT) AS n_lines,
               CAST(CAST(sum(cents) AS HUGEINT) AS DOUBLE) / 100.0 AS revenue
        FROM li
        JOIN orders o ON li.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON li.l_suppkey = s.s_suppkey
                       AND c.c_nationkey = s.s_nationkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name""",
    "ex_forecast_revenue": f"""
        WITH li AS (SELECT CAST(l_quantity AS BIGINT) AS q,
               CAST(floor(l_discount * 1000000 + 0.5) AS BIGINT) AS disc_u,
               {_cents_o('l_extendedprice * l_discount')} AS cents
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00')
        SELECT CAST(count(*) AS BIGINT) AS n_lines,
               CAST(CAST(sum(cents) AS HUGEINT) AS DOUBLE) / 100.0 AS revenue
        FROM li WHERE disc_u BETWEEN 50000 AND 70000 AND q < 24""",
    "ex_market_share": f"""
        WITH li AS (SELECT l_orderkey, l_partkey, l_suppkey,
               {_cents_o('l_extendedprice * (1 - l_discount)')} AS cents
            FROM lineitem)
        SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
               CAST(CAST(sum(CASE WHEN s.s_nationkey = 1 THEN cents ELSE 0 END)
                    AS HUGEINT) AS DOUBLE)
                   / CAST(CAST(sum(cents) AS HUGEINT) AS DOUBLE) AS mkt_share,
               CAST(CAST(sum(cents) AS HUGEINT) AS DOUBLE) / 100.0
                   AS total_revenue
        FROM li
        JOIN part p ON li.l_partkey = p.p_partkey
        JOIN orders o ON li.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        JOIN supplier s ON li.l_suppkey = s.s_suppkey
        WHERE p.p_type = 'ECONOMY' AND r.r_name = 'AMERICA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY 1""",
    "ex_product_profit": f"""
        WITH li AS (SELECT l_orderkey, l_partkey, l_suppkey,
               CAST(l_quantity AS BIGINT) AS q,
               {_cents_o('l_extendedprice * (1 - l_discount)')} AS rev_c
            FROM lineitem),
        pt AS (SELECT p_partkey,
               CAST((CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) * 6)
                    // 10 AS BIGINT) AS cost_c
            FROM part WHERE p_name LIKE '%blue%')
        SELECT n_name, CAST(year(o.o_orderdate) AS INT) AS o_year,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(CAST(sum(rev_c - q * cost_c) AS HUGEINT) AS DOUBLE) / 100.0
                   AS profit
        FROM li
        JOIN pt ON li.l_partkey = pt.p_partkey
        JOIN orders o ON li.l_orderkey = o.o_orderkey
        JOIN supplier s ON li.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY 1, 2""",
    "ex_returned_items": f"""
        WITH li AS (SELECT l_orderkey,
               {_cents_o('l_extendedprice * (1 - l_discount)')} AS cents
            FROM lineitem WHERE l_returnflag = 'R'),
        per AS (SELECT o.o_custkey,
                       CAST(count(*) AS BIGINT) AS n_lines,
                       CAST(sum(cents) AS HUGEINT) AS rev_c
            FROM li JOIN orders o ON li.l_orderkey = o.o_orderkey
            WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
            GROUP BY 1)
        SELECT c.c_custkey, c.c_name, n.n_name, per.n_lines,
               CAST(rev_c AS DOUBLE) / 100.0 AS revenue
        FROM per
        JOIN customer c ON per.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        ORDER BY rev_c DESC, c.c_custkey LIMIT 20""",
    "ex_important_stock": """
        WITH pt AS (SELECT p_partkey,
               CAST((CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) * 6)
                    // 10 AS BIGINT) AS cost_c
            FROM part),
        per AS (SELECT l_partkey,
                       CAST(sum(CAST(l_quantity AS BIGINT) * cost_c)
                            AS HUGEINT) AS value_c
            FROM lineitem JOIN pt ON l_partkey = p_partkey
            GROUP BY 1),
        tot AS (SELECT CAST(sum(value_c) AS HUGEINT) AS total_c,
                       CAST(count(*) AS BIGINT) AS n_parts FROM per)
        SELECT l_partkey AS p_partkey,
               CAST(value_c AS DOUBLE) / 100.0 AS value
        FROM per, tot WHERE value_c * n_parts * 2 > total_c * 3""",
    "ex_top_supplier": f"""
        WITH li AS (SELECT l_suppkey,
               {_cents_o('l_extendedprice * (1 - l_discount)')} AS cents
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'),
        rev AS (SELECT l_suppkey, CAST(sum(cents) AS HUGEINT) AS rev_c
                FROM li GROUP BY 1),
        mx AS (SELECT max(rev_c) AS max_c FROM rev)
        SELECT s.s_suppkey, s.s_name,
               CAST(rev_c AS DOUBLE) / 100.0 AS total_revenue
        FROM rev, mx
        JOIN supplier s ON s.s_suppkey = rev.l_suppkey
        WHERE rev_c = max_c""",
    "ex_parts_supplier_counts": """
        SELECT p_brand, p_type, p_size,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pr
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'ECON%'
          AND p_size IN (1, 5, 10, 15, 20, 25)
          AND l_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3""",
    "ex_global_sales_opportunity": f"""
        WITH cust AS (SELECT c_custkey, c_nationkey,
               {_cents_o('c_acctbal')} AS bal_c
            FROM customer
            WHERE c_nationkey IN (0, 3, 5, 7, 9, 11, 13)),
        pos AS (SELECT CAST(sum(bal_c) AS HUGEINT) AS sum_c,
                       CAST(count(*) AS BIGINT) AS n_pos
                FROM cust WHERE bal_c > 0)
        SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
               CAST(CAST(sum(bal_c) AS HUGEINT) AS DOUBLE) / 100.0
                   AS totacctbal
        FROM cust, pos
        WHERE bal_c * n_pos > sum_c
          AND c_custkey NOT IN
              (SELECT o_custkey FROM orders
               WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        GROUP BY 1""",
    # ---- round-9 LLM-pipeline additions ----
    # non-distinct trigram counts per doc (same degenerate short-doc rule
    # as _SHINGLES), then the Gopher duplicate-fraction rollup
    "ex_repetition_stats": f"""
        WITH toks AS (SELECT doc_id, {_TOKS.format(t='text')} AS t
                      FROM documents),
        sh AS (SELECT doc_id, array_to_string(t[i:i+{C.SHINGLE_WORDS - 1}], ' ') AS s
               FROM toks,
               UNNEST(range(1, greatest(len(t) - {C.SHINGLE_WORDS - 2}, 2))) AS u(i)),
        per_gram AS (SELECT doc_id, s, count(*) AS cnt FROM sh GROUP BY 1, 2),
        per_doc AS (SELECT doc_id,
                           CAST(sum(cnt) AS BIGINT) AS n_grams,
                           CAST(count(*) AS BIGINT) AS n_distinct,
                           CAST(max(cnt) AS BIGINT) AS max_repeat
                    FROM per_gram GROUP BY 1)
        SELECT doc_id, n_grams, n_distinct, max_repeat,
               CAST(n_grams - n_distinct AS DOUBLE)
                   / CAST(n_grams AS DOUBLE) AS dup_frac,
               CAST(n_grams - n_distinct AS DOUBLE)
                   / CAST(n_grams AS DOUBLE) > 0.1 AS drop_doc
        FROM per_doc""",
    # DuckDB's native ASOF JOIN replays the composite-max rule: orders
    # reduce to one row per (custkey, day) with max orderkey, the as-of
    # picks the latest day ≤ ts, and the 365-day lookback NULLs the match
    # post-join (the latest row is the only in-window candidate)
    "ex_asof_features": """
        WITH ee AS (SELECT event_id, user_id,
                           TIMESTAMP '1995-06-01'
                               + (((epoch_us(ts) // 1000000) * 1009)
                                  % 190000000) * INTERVAL 1 SECOND AS ts
                    FROM events),
        od AS (SELECT o_custkey AS user_id, o_orderdate AS ots,
                      CAST(max(o_orderkey) AS BIGINT) AS okey
               FROM orders GROUP BY 1, 2),
        ov AS (SELECT user_id, ots,
                      CAST(datediff('day', DATE '1992-01-01', ots) AS BIGINT)
                          * 17592186044416 + okey AS oval
               FROM od)
        SELECT e.event_id, e.user_id,
               CASE WHEN o.oval IS NULL
                      OR o.ots <= e.ts - INTERVAL 365 DAY THEN NULL
                    ELSE CAST(o.oval // 17592186044416 AS BIGINT) END AS order_day,
               CASE WHEN o.oval IS NULL
                      OR o.ots <= e.ts - INTERVAL 365 DAY THEN NULL
                    ELSE CAST(o.oval % 17592186044416 AS BIGINT) END AS order_key
        FROM ee e ASOF LEFT JOIN ov o
          ON e.user_id = o.user_id AND e.ts >= o.ots""",
    # winnowing: positional trigram hashes, min per 4-window (tail windows
    # included), distinct fingerprints, df cap, shared-count pairs
    "ex_winnow_fingerprint": f"""
        WITH toks AS (SELECT doc_id, {_TOKS.format(t='text')} AS t
                      FROM documents),
        sh AS (SELECT doc_id, i AS pos,
                      array_to_string(t[i:i+{C.SHINGLE_WORDS - 1}], ' ') AS s
               FROM toks,
               UNNEST(range(1, greatest(len(t) - {C.SHINGLE_WORDS - 2}, 2))) AS u(i)),
        hh AS (SELECT doc_id, pos,
                      CAST(concat('0x', substring(md5(s), 1, 15)) AS BIGINT)
                          % {C.MINHASH_P} AS h
               FROM sh),
        wmin AS (SELECT doc_id,
                        min(h) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW
                            AND {C.WINNOW_W - 1} FOLLOWING) AS fp
                 FROM hh),
        fp AS (SELECT DISTINCT doc_id, fp FROM wmin),
        dfc AS (SELECT fp, count(*) AS df FROM fp GROUP BY 1),
        kept AS (SELECT doc_id, f.fp FROM fp f JOIN dfc USING (fp)
                 WHERE df <= {C.WINNOW_MAX_DF})
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= {C.WINNOW_MIN_SHARED}""",
    # the oracle states the range join DIRECTLY as the inequality
    # self-join the binned plan is equivalent to (the equivalence IS the
    # check: binning must not lose or duplicate any in-range pair)
    "ex_range_join": """
        WITH ev AS (SELECT user_id, event_type,
                           epoch_us(ts) AS t FROM events)
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(CAST(sum(b.t - a.t) AS HUGEINT) AS DOUBLE)
                   / 1000000.0 / CAST(count(*) AS DOUBLE) AS avg_gap_s
        FROM ev a JOIN ev b
          ON a.user_id = b.user_id
         AND b.t > a.t AND b.t <= a.t + 300000000
        GROUP BY 1, 2""",
    # winnow pairs -> recursive-CTE connected components -> drop
    # non-canonical members -> per-source survivor summary (the shared
    # dedup-apply oracle shape)
    "ex_winnow_dedup_apply": f"""
        WITH RECURSIVE toks AS (SELECT doc_id, {_TOKS.format(t='text')} AS t
                      FROM documents),
        sh AS (SELECT doc_id, i AS pos,
                      array_to_string(t[i:i+{C.SHINGLE_WORDS - 1}], ' ') AS s
               FROM toks,
               UNNEST(range(1, greatest(len(t) - {C.SHINGLE_WORDS - 2}, 2))) AS u(i)),
        hh AS (SELECT doc_id, pos,
                      CAST(concat('0x', substring(md5(s), 1, 15)) AS BIGINT)
                          % {C.MINHASH_P} AS h
               FROM sh),
        wmin AS (SELECT doc_id,
                        min(h) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW
                            AND {C.WINNOW_W - 1} FOLLOWING) AS fp
                 FROM hh),
        fp AS (SELECT DISTINCT doc_id, fp FROM wmin),
        dfc AS (SELECT fp, count(*) AS df FROM fp GROUP BY 1),
        kept AS (SELECT doc_id, f.fp FROM fp f JOIN dfc USING (fp)
                 WHERE df <= {C.WINNOW_MAX_DF}),
        pairs AS (SELECT a.doc_id AS da, b.doc_id AS db
                  FROM kept a JOIN kept b
                    ON a.fp = b.fp AND a.doc_id < b.doc_id
                  GROUP BY 1, 2
                  HAVING count(*) >= {C.WINNOW_MIN_SHARED}),
        {_CC_APPLY_EPILOGUE}""",
}

# the streaming-lambda anomaly entry drains the identical hourly table
# before flagging, so it shares ex_anomaly's oracle verbatim
ORACLES["st_anomaly"] = ORACLES["ex_anomaly"]

# the streaming CCNet leg drains the positional token table and rebuilds
# the exact in-array bigrams by adjacency, so one tercile oracle serves both
ORACLES["st_perplexity_buckets"] = ORACLES["ex_perplexity_buckets"]

# the salted two-phase top-m is lossless (a global top-m row is in its
# slice's top-m), so the skew route shares the plain balance oracle
ORACLES["ex_balance_classes_skew"] = ORACLES["ex_balance_classes"]

# sampling / routing are row-local hash decisions, so the ingest-time
# streaming legs drain exactly the batch result sets
ORACLES["st_stratified_sample"] = ORACLES["ex_stratified_sample"]
ORACLES["st_hash_split"] = ORACLES["ex_hash_split"]

# streaming heavy hitters maintains the same token counts complete-mode;
# the drained snapshot equals the batch table, so one oracle serves both
ORACLES["st_heavy_hitters"] = ORACLES["ex_heavy_hitters"]
# the HDR sketch merges by integer bucket addition, so the drained
# complete-mode snapshot is bit-identical to the batch sketch for any
# micro-batch split — one oracle serves both legs
ORACLES["st_hdr_quantile"] = ORACLES["ex_hdr_quantile"]
# streaming substring dedup extracts the same two narrow tables at
# ingest; the drained stores equal the batch extraction, one oracle
ORACLES["st_dedup_substring"] = ORACLES["ex_dedup_substring"]
# the streaming perceptual apply drains the same fingerprint table;
# clusters/apply over it equal the batch chain — one oracle
ORACLES["st_image_dedup_apply"] = ORACLES["ex_image_dedup_apply"]
ORACLES["st_audio_dedup_apply"] = ORACLES["ex_audio_dedup_apply"]
ORACLES["st_video_dedup_apply"] = ORACLES["ex_video_dedup_apply"]
# streaming BM25 drains the same token extraction; one oracle
ORACLES["st_bm25"] = ORACLES["ex_bm25"]
# streaming containment drains the same shingle extraction (distinct
# applied post-drain); one oracle
ORACLES["st_containment_dedup"] = ORACLES["ex_containment_dedup"]
# st_image_neardup fingerprints at ingest and joins over the drained
# store; the snapshot equals the batch hash table, so the oracle is exact
ORACLES["st_image_neardup"] = ORACLES["ex_image_neardup"]
ORACLES["st_audio_neardup"] = ORACLES["ex_audio_neardup"]
ORACLES["st_video_neardup"] = ORACLES["ex_video_neardup"]

# the streaming model scorer is the identical stateless projection run
# in append mode, so it shares the batch oracle verbatim
ORACLES["st_quality_model"] = ORACLES["ex_quality_model"]

# round-9 stateless ingest projections: identical expressions run in
# append mode over the replayed stream, so each shares its batch oracle
ORACLES["st_lang_id"] = ORACLES["ex_lang_id"]
ORACLES["st_pii_scrub"] = ORACLES["ex_pii_scrub"]
ORACLES["st_text_stats"] = ORACLES["ex_text_stats"]
# the streaming winnow leg drains the identical fingerprint table; the
# streaming as-of leg drains the raw event triples — each analysis over
# the drained store equals the batch pass, one oracle apiece
ORACLES["st_winnow_fingerprint"] = ORACLES["ex_winnow_fingerprint"]
ORACLES["st_asof_features"] = ORACLES["ex_asof_features"]
# the streaming repetition leg drains the identical trigram table; the
# rollup over the drained store equals the batch pass
ORACLES["st_repetition_stats"] = ORACLES["ex_repetition_stats"]
# the skew-safe cogrouped-pandas kernel computes the identical result
# (equivalence unit-tested); same oracle
ORACLES["ex_asof_features_skew"] = ORACLES["ex_asof_features"]


def _lttb_seq_sql() -> str:
    """Canonical sequential LTTB, chain unrolled step-by-step (the
    kmeans/pagerank/BPE trajectory-replay pattern). Float discipline
    mirrors functions/timeseries.py exactly: integer-relative x, the
    sign-aware half-away y-millis formula written out (never round()),
    anchors as CAST(sum(int) AS DOUBLE)/count/scale, and the area
    expression in the same operation order — every compared double is
    bit-identical cross-engine, ties break on exact ints (x, id)."""
    ib = C.LTTB_SEQ_BUCKETS - 2
    area = (
        "abs((a{k}.ax - {nx}) * (c.py - a{k}.ay)"
        " - (a{k}.ax - c.px) * ({ny} - a{k}.ay)) * 0.5"
    )
    parts = [
        """e AS (SELECT event_type AS s, event_id,
                        epoch_us(CAST(ts AS TIMESTAMP)) AS xa, value AS y
                 FROM events),
        o AS (SELECT s, event_id, xa, y,
                     row_number() OVER (PARTITION BY s ORDER BY xa, event_id) AS rn,
                     count(*) OVER (PARTITION BY s) AS n,
                     min(xa) OVER (PARTITION BY s) AS x0
              FROM e),
        p AS (SELECT s, event_id, xa, rn, n, xa - x0 AS xr,
                     CAST(CASE WHEN y >= 0 THEN floor(y * 1000.0 + 0.5)
                               ELSE -floor(-y * 1000.0 + 0.5) END AS BIGINT) AS ymil
              FROM o),
        c AS (SELECT s, event_id, xa, xr, ymil,
                     CAST(xr AS DOUBLE) / 1000000.0 AS px,
                     CAST(ymil AS DOUBLE) / 1000.0 AS py,
                     CAST(((rn - 2) * {ib}) // (n - 2) AS BIGINT) AS b
              FROM p WHERE rn > 1 AND rn < n),
        m AS (SELECT s, b,
                     CAST(CAST(sum(xr) AS BIGINT) AS DOUBLE) / count(*) / 1000000.0 AS mx,
                     CAST(CAST(sum(ymil) AS BIGINT) AS DOUBLE) / count(*) / 1000.0 AS my
              FROM c GROUP BY s, b),
        fp AS (SELECT s, event_id, xa,
                      CAST(xr AS DOUBLE) / 1000000.0 AS px,
                      CAST(ymil AS DOUBLE) / 1000.0 AS py
               FROM p WHERE rn = 1),
        lp AS (SELECT s, event_id, xa,
                      CAST(xr AS DOUBLE) / 1000000.0 AS px,
                      CAST(ymil AS DOUBLE) / 1000.0 AS py
               FROM p WHERE rn = n),
        a0 AS (SELECT s, px AS ax, py AS ay FROM fp)""".format(ib=ib)
    ]
    for k in range(ib):
        if k < ib - 1:
            join = f"JOIN m ON m.s = c.s AND m.b = {k + 1}"
            nx, ny = "m.mx", "m.my"
        else:
            join = "JOIN lp ON lp.s = c.s"
            nx, ny = "lp.px", "lp.py"
        a = area.format(k=k, nx=nx, ny=ny)
        parts.append(
            f"""sel{k} AS (SELECT c.s, c.event_id, c.xa, c.px, c.py
                 FROM c JOIN a{k} ON a{k}.s = c.s {join}
                 WHERE c.b = {k}
                 QUALIFY row_number() OVER (PARTITION BY c.s
                     ORDER BY {a} DESC, c.xa, c.event_id) = 1)"""
        )
        parts.append(f"a{k + 1} AS (SELECT s, px AS ax, py AS ay FROM sel{k})")
    selects = [
        "SELECT s AS series, 0 AS step, event_id, xa AS x_us, py AS y FROM fp"
    ]
    for k in range(ib):
        selects.append(
            f"SELECT s, {k + 1}, event_id, xa, py FROM sel{k}"
        )
    selects.append(f"SELECT s, {ib + 1}, event_id, xa, py FROM lp")
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL ".join(selects)


ORACLES["ex_downsample_seq"] = _lttb_seq_sql()
