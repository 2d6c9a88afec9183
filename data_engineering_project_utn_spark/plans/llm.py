"""Training-data pipeline queries (dedup, text analysis, similarity search,
multimodal) on the driver's ``documents`` and ``embeddings`` tables.

These go beyond the reference's own surface (BASELINE.json north star).
Oracle SQL mirrors each Spark expression *operation-for-operation* (same
fold order, same integer arithmetic) so doubles hash-match bit-exactly —
see the determinism contract in plans/registry.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_engineering_project_utn_spark.llm import dedup as dd
from data_engineering_project_utn_spark.llm.dedup import parallelize_compute
from data_engineering_project_utn_spark.llm import multimodal as mm
from data_engineering_project_utn_spark.llm import sampling as sa
from data_engineering_project_utn_spark.llm import similarity as sim
from data_engineering_project_utn_spark.llm import text as tx
from data_engineering_project_utn_spark.plans.registry import must_replace, register
from data_engineering_project_utn_spark.tables import load_table

# Oracle fragment: whitespace tokens, lowercased (== llm.text.tokens).
_TOKS = r"string_split_regex(lower(text), '\s+')"
# Oracle fragment: 5-gram shingle strings from token list ``t``.
_SHINGLES = "list_transform(range(1, greatest(len(t) - 4, 1) + 1), i -> array_to_string(t[i:i+4], ' '))"
# Oracle fragment: sequential-fold dot product of two lists (matches
# llm.similarity.dot: left fold, init 0 absorbed by first addition).
def _dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (acc, x) -> acc + x)"
    )


@register(
    "llm_dedup_summary",
    oracle=f"""
    SELECT COUNT(*) AS total_docs,
           COUNT(DISTINCT md5(text)) AS distinct_content,
           COUNT(DISTINCT md5(array_to_string(list_sort(list_distinct({_TOKS})), ' ')))
               AS distinct_normalized,
           COUNT(*) - COUNT(DISTINCT md5(text)) AS exact_dups,
           COUNT(*) - COUNT(DISTINCT md5(array_to_string(list_sort(list_distinct({_TOKS})), ' ')))
               AS normalized_dups
    FROM documents
    """,
    tags=("llm", "dedup", "bench"),
)
def llm_dedup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact + normalized (order/case-invariant) dedup accounting.

    Hash-groupBy dedup: one shuffle on a 128-bit digest — the exact-dedup
    baseline for corpus hygiene at any scale (count-distinct here is
    partial-aggregated; swap to approx_count_distinct at 100 TB if ±1% ok).
    """
    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    return d.agg(
        F.count(F.lit(1)).alias("total_docs"),
        F.countDistinct(dd.content_hash("text")).alias("distinct_content"),
        F.countDistinct(dd.normalized_hash("text")).alias("distinct_normalized"),
        (F.count(F.lit(1)) - F.countDistinct(dd.content_hash("text"))).alias("exact_dups"),
        (F.count(F.lit(1)) - F.countDistinct(dd.normalized_hash("text"))).alias(
            "normalized_dups"
        ),
    )


@register(
    "llm_token_stats",
    oracle=f"""
    WITH tk AS (SELECT doc_id, lang, source, n_chars, {_TOKS} AS t FROM documents)
    SELECT doc_id, lang, source, n_chars,
           CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct_tokens,
           CAST(len(list_filter(t, x -> list_contains(['the','a','and','of','to','in','is','it'], x))) AS BIGINT)
               AS n_stopwords
    FROM tk
    """,
    tags=("llm", "text"),
)
def llm_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counting (whitespace tokenizer) — narrow
    projection, scan-speed at any scale."""
    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        tx.token_count("text").alias("n_tokens"),
        tx.distinct_token_count("text").alias("n_distinct_tokens"),
        tx.stopword_count("text", "en").alias("n_stopwords"),
    )


# Oracle fragment: per-doc quality score CTEs (== llm.text.quality_score —
# stopword list, 100-token saturation cap, 0.4/0.3/0.3 weights).  Shared by
# every oracle that orders or filters on quality, so the formula can't
# drift between gates.  Emits CTEs tk/m/q; q has (doc_id, lang, quality).
_QUALITY_CTES = f"""tk AS (SELECT doc_id, lang, {_TOKS} AS t FROM documents),
    m AS (SELECT doc_id, lang,
                 CAST(len(t) AS BIGINT) AS n,
                 CAST(len(list_filter(t, x -> list_contains(['the','a','and','of','to','in','is','it'], x))) AS BIGINT) AS stop,
                 CAST(len(list_distinct(t)) AS BIGINT) AS uniq
          FROM tk),
    q AS (SELECT doc_id, lang,
                 0.4 * LEAST(CAST(n AS DOUBLE) / 100.0, 1.0)
               + 0.3 * (CAST(stop AS DOUBLE) / CAST(n AS DOUBLE))
               + 0.3 * (CAST(uniq AS DOUBLE) / CAST(n AS DOUBLE)) AS quality
          FROM m)"""


@register(
    "llm_quality_scores",
    oracle="WITH " + _QUALITY_CTES + """
    SELECT doc_id, quality FROM q
    """,
    tags=("llm", "text", "bench"),
)
def llm_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length saturation + stopword share + lexical
    diversity (C4/Gopher-style heuristic filters, deterministic form)."""
    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    return d.select("doc_id", tx.quality_score("text").alias("quality"))


@register(
    "llm_langid",
    oracle=f"""
    WITH tk AS (SELECT doc_id, lang, {_TOKS} AS t FROM documents),
    s AS (SELECT doc_id, lang,
            CAST(len(list_filter(t, x -> list_contains(['the','a','and','of','to','in','is','it'], x))) AS BIGINT) AS s_en,
            CAST(len(list_filter(t, x -> list_contains(['el','la','de','que','y','en','un','es'], x))) AS BIGINT) AS s_es,
            CAST(len(list_filter(t, x -> list_contains(['der','die','das','und','ist','von','ein','zu'], x))) AS BIGINT) AS s_de,
            CAST(len(list_filter(t, x -> list_contains(['le','la','de','et','un','est','que','en'], x))) AS BIGINT) AS s_fr
          FROM tk),
    p AS (SELECT doc_id, lang,
            CASE WHEN GREATEST(s_en, s_es, s_de, s_fr) <= 0 THEN 'und'
                 WHEN s_en = GREATEST(s_en, s_es, s_de, s_fr) THEN 'en'
                 WHEN s_es = GREATEST(s_en, s_es, s_de, s_fr) THEN 'es'
                 WHEN s_de = GREATEST(s_en, s_es, s_de, s_fr) THEN 'de'
                 ELSE 'fr' END AS predicted
          FROM s)
    SELECT lang, predicted, COUNT(*) AS n FROM p GROUP BY lang, predicted
    """,
    tags=("llm", "text", "langid"),
)
def llm_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-heuristic language ID vs the labeled lang column
    (confusion-matrix counts).  Tie-break: first of (en, es, de, fr)."""
    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    return (
        d.select("lang", tx.predicted_lang("text").alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "llm_fingerprints",
    oracle=f"""
    WITH tk AS (SELECT doc_id, {_TOKS} AS t FROM documents)
    SELECT doc_id,
           list_min(list_transform({_SHINGLES}, s -> md5(s))) AS fingerprint,
           CAST(len({_SHINGLES}) AS BIGINT) AS n_shingles
    FROM tk
    """,
    tags=("llm", "dedup", "fingerprint"),
)
def llm_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 5-gram document fingerprint (1-perm MinHash): lexicographic
    min of shingle digests."""
    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        tx.rolling_fingerprint("text", 5).alias("fingerprint"),
        F.size(tx.shingles("text", 5)).cast("long").alias("n_shingles"),
    )


_MINHASH_CTES = f"""tk AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id,
                  list_transform({_SHINGLES}, s -> md5(s)) AS hd,
                  list_distinct({_SHINGLES}) AS shset
           FROM tk),
    sig AS (SELECT doc_id, shset,
                   list_transform(range(0, 8),
                       i -> list_min(list_transform(hd,
                           h -> substring(h, i*4 + 1, 32) || substring(h, 1, i*4)))) AS sg
            FROM sh),
    bands AS (SELECT doc_id, shset, r.b AS band_idx,
                     md5(array_to_string(sg[r.b*2+1 : r.b*2+2], '|')) AS band_hash
              FROM sig, range(0, 4) r(b)),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b
               ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
              AND a.doc_id < b.doc_id),
    j AS (SELECT c.doc_a, c.doc_b,
                 CAST(len(list_intersect(sa.shset, sb.shset)) AS DOUBLE)
                 / (CAST(len(sa.shset) + len(sb.shset) AS DOUBLE)
                    - CAST(len(list_intersect(sa.shset, sb.shset)) AS DOUBLE)) AS jaccard
          FROM cand c
          JOIN sh sa ON sa.doc_id = c.doc_a
          JOIN sh sb ON sb.doc_id = c.doc_b)"""


@register(
    "llm_minhash_neardup",
    priority=0,
    oracle="WITH " + _MINHASH_CTES + """
    SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard > 0.5
    """,
    tags=("llm", "dedup", "minhash", "bench"),
)
def llm_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-duplicate detection, exact-Jaccard verified.

    shingle(5-gram) → 8-perm minhash → 4 bands → bucket self-join →
    Jaccard > 0.5.  Only same-bucket docs are ever compared — the shuffle
    key space is the band buckets, never all-pairs (see llm/dedup.py).
    """
    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    # max_bucket_size=None pins the EXACT pair set this oracle models at
    # every SF (the skew cap is opt-in; its oracle twin is llm_minhash_capped)
    return dd.minhash_neardup(d, k=8, bands=4, n=5, threshold=0.5, max_bucket_size=None)


@register(
    "llm_bottomk_neardup",
    priority=0,
    oracle="WITH " + must_replace(
        _MINHASH_CTES,
        """sig AS (SELECT doc_id, shset,
                   list_transform(range(0, 8),
                       i -> list_min(list_transform(hd,
                           h -> substring(h, i*4 + 1, 32) || substring(h, 1, i*4)))) AS sg
            FROM sh),
    bands AS (SELECT doc_id, shset, r.b AS band_idx,
                     md5(array_to_string(sg[r.b*2+1 : r.b*2+2], '|')) AS band_hash
              FROM sig, range(0, 4) r(b)),""",
        """sig AS (SELECT doc_id, shset,
                   list_sort(list_distinct(hd))[1:16] AS sg
            FROM sh),
    bands AS (SELECT doc_id, shset, r.b AS band_idx,
                     md5(array_to_string(sg[r.b+1 : r.b+1], '|')) AS band_hash
              FROM sig, range(0, 16) r(b)
              WHERE md5(array_to_string(sg[r.b+1 : r.b+1], '|')) <> md5('')),""",
    ) + """
    SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard > 0.5
    """,
    tags=("llm", "dedup", "bottomk", "bench"),
)
def llm_bottomk_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-16 sketch near-dup — the cheap-signature alternative to the
    8-perm rotation family (one sort vs 8 interpreted passes; measured
    254/256 of the rotation family's verified pairs at ~40 % cost on
    sf0.1).  Same exact-Jaccard verification gate."""
    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    return dd.bottomk_neardup(d, k=16, n=5, threshold=0.5, max_bucket_size=None)


@register(
    "llm_minhash_capped",
    priority=1,
    oracle="WITH " + must_replace(
        _MINHASH_CTES,
        """cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b
               ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
              AND a.doc_id < b.doc_id),""",
        """bsize AS (SELECT band_idx, band_hash, COUNT(*) AS cnt
              FROM bands GROUP BY band_idx, band_hash),
    healthy AS (SELECT b.* FROM bands b JOIN bsize s
                  ON b.band_idx = s.band_idx AND b.band_hash = s.band_hash
                 WHERE s.cnt <= 2),
    hot AS (SELECT b.* FROM bands b JOIN bsize s
              ON b.band_idx = s.band_idx AND b.band_hash = s.band_hash
             WHERE s.cnt > 2),
    chained AS (SELECT doc_id AS doc_a,
                       lead(doc_id) OVER (PARTITION BY band_idx, band_hash
                                          ORDER BY doc_id) AS doc_b
                FROM hot),
    cand AS (SELECT DISTINCT doc_a, doc_b FROM (
                 SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM healthy a JOIN healthy b
                   ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
                  AND a.doc_id < b.doc_id
                 UNION ALL
                 SELECT doc_a, doc_b FROM chained WHERE doc_b IS NOT NULL)),""",
    ) + """
    SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard > 0.5
    """,
    tags=("llm", "dedup", "minhash", "skew"),
)
def llm_minhash_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The duplicate-skew-hardened MinHash path, cap forced to 2 so the
    chain-pairing branch actually executes at sf0.01 (real default: 256 —
    never reached by healthy banding): band buckets over the cap emit only
    (doc, successor-by-id) pairs instead of all pairs, bounding candidate
    work to O(|bucket|) at the duplicate-heavy corpora dedup exists for.
    The oracle reproduces the size split, the chain window, and the union
    operation-for-operation."""
    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    return dd.minhash_neardup(d, k=8, bands=4, n=5, threshold=0.5, max_bucket_size=2)


@register(
    "llm_dedup_clusters",
    priority=0,
    oracle="WITH RECURSIVE " + _MINHASH_CTES + """
    , pairs AS (SELECT doc_a, doc_b FROM j WHERE jaccard > 0.5),
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    )
    SELECT src AS doc_id, LEAST(src, MIN(dst)) AS keeper_doc
    FROM reach GROUP BY src ORDER BY doc_id
    """,
    tags=("llm", "dedup", "clusters", "iterative"),
)
def llm_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup *decision* step: connected components over the MinHash
    near-dup pairs; every component keeps its min doc_id.  Iterative label
    propagation in Spark (O(component-diameter) joins) vs the oracle's
    recursive-CTE transitive closure — identical integer fixpoint."""
    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    pairs = dd.minhash_neardup(d, k=8, bands=4, n=5, threshold=0.5, max_bucket_size=None)
    return dd.dedup_clusters(pairs).orderBy("doc_id")


# Oracle fragment: 3-gram shingles from token list ``t`` (mirrors
# llm.text.shingles(n=3): inclusive slice of 3 tokens, short docs → 1 shingle).
_SH3 = "list_transform(range(1, greatest(len(t) - 2, 1) + 1), i -> array_to_string(t[i:i+2], ' '))"


@register(
    "llm_ngram_jaccard",
    priority=0,
    oracle=f"""
    WITH tk AS (SELECT doc_id, lang, source, {_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id, lang, source, list_distinct({_SH3}) AS s FROM tk),
    p AS (SELECT a.lang, a.source, a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / (CAST(len(a.s) + len(b.s) AS DOUBLE)
                    - CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)) AS jaccard
          FROM sh a JOIN sh b
            ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id)
    SELECT lang, source, id_a, id_b, jaccard FROM p WHERE jaccard > 0.1
    """,
    tags=("llm", "dedup", "jaccard"),
)
def llm_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise exact 3-gram Jaccard within (lang, source) blocks.

    Blocking is the scale contract: shingle sets are built once per doc
    (never per pair), and the pair space is Σ|block|² — at 100 TB the block
    key becomes an LSH band (llm_minhash_neardup) instead of metadata, but
    the operator shape is identical."""
    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    sh = d.select(
        "doc_id",
        "lang",
        "source",
        F.array_distinct(tx.shingles("text", 3)).alias("s"),
    )
    a = sh.select(
        "lang", "source", F.col("doc_id").alias("id_a"), F.col("s").alias("sa")
    )
    b = sh.select(
        "lang", "source", F.col("doc_id").alias("id_b"), F.col("s").alias("sb")
    )
    pairs = a.join(b, ["lang", "source"]).filter(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb"))).cast("double")
    union = (F.size(F.col("sa")) + F.size(F.col("sb"))).cast("double") - inter
    return pairs.select(
        "lang", "source", "id_a", "id_b", (inter / union).alias("jaccard")
    ).filter(F.col("jaccard") > 0.1)


_IVF_ANN_ORACLE = f"""
    WITH cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
    scored AS (
        SELECT e.vec_id, e.embedding, c.cid,
               {_dot('e.embedding', 'c.cv')}
               / (sqrt({_dot('e.embedding', 'e.embedding')}) * sqrt({_dot('c.cv', 'c.cv')}))
                   AS cos_c
        FROM embeddings e CROSS JOIN cents c
    ),
    cells AS (
        SELECT vec_id, embedding, cid AS cell
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                           ORDER BY cos_c DESC, cid DESC) AS rn
              FROM scored)
        WHERE rn = 1
    ),
    q AS (SELECT vec_id AS q_id, embedding AS qv, cell AS q_cell
          FROM cells WHERE vec_id = 0)
    SELECT s.vec_id,
           {_dot('q.qv', 's.embedding')}
           / (sqrt({_dot('q.qv', 'q.qv')}) * sqrt({_dot('s.embedding', 's.embedding')}))
               AS cos_sim
    FROM cells s, q
    WHERE s.cell = q.q_cell AND s.vec_id <> q.q_id
    ORDER BY cos_sim DESC, s.vec_id
    LIMIT 10
    """


@register(
    "llm_ivf_ann",
    priority=0,
    oracle=_IVF_ANN_ORACLE,
    tags=("llm", "similarity", "ann", "ivf"),
)
def llm_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-10 (nprobe=1): 8 coarse centroids (vec_id 0-7 as the
    deterministic quantizer), cell assignment as a literal-centroid
    projection (no shuffle — see llm/similarity.py:ivf_cells), exact cosine
    within the probed cell.  The centroid collect is 8 rows — a model
    parameter, not data movement."""
    e = parallelize_compute(load_table(spark, sf_dir, "embeddings"))
    cents = [
        (int(r["vec_id"]), list(r["embedding"]))
        for r in e.filter(F.col("vec_id") < 8).select("vec_id", "embedding").collect()
    ]
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    return sim.knn_ivf(e, q, cents, k=10)


@register(
    "llm_ivf_bcast",
    priority=1,
    oracle=_IVF_ANN_ORACLE,
    tags=("llm", "similarity", "ann", "ivf", "broadcast"),
)
def llm_ivf_bcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """llm_ivf_ann through the *broadcast-centroid* scoring path
    (``max_literal_centroids=0`` forces the packed-array BroadcastHashJoin
    plan that a 65k-centroid quantizer requires — see
    llm/similarity.py:ivf_cells).  Shares llm_ivf_ann's oracle verbatim:
    both paths fold identical doubles, so the gate proves bit-exact parity
    of the large-k plan, not merely plausibility."""
    e = parallelize_compute(load_table(spark, sf_dir, "embeddings"))
    cents = [
        (int(r["vec_id"]), list(r["embedding"]))
        for r in e.filter(F.col("vec_id") < 8).select("vec_id", "embedding").collect()
    ]
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    return sim.knn_ivf(e, q, cents, k=10, max_literal_centroids=0)


@register(
    "llm_ivf_nprobe",
    priority=1,
    oracle=f"""
    WITH cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
    scored AS (
        SELECT e.vec_id, e.embedding, c.cid,
               {_dot('e.embedding', 'c.cv')}
               / (sqrt({_dot('e.embedding', 'e.embedding')}) * sqrt({_dot('c.cv', 'c.cv')}))
                   AS cos_c
        FROM embeddings e CROSS JOIN cents c
    ),
    ranked AS (SELECT vec_id, embedding, cid,
                      ROW_NUMBER() OVER (PARTITION BY vec_id
                                         ORDER BY cos_c DESC, cid DESC) AS rn
               FROM scored),
    cells AS (SELECT vec_id, embedding, cid AS cell FROM ranked WHERE rn = 1),
    probes AS (SELECT cid AS q_cell FROM ranked WHERE vec_id = 0 AND rn <= 2),
    q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT s.vec_id,
           {_dot('q.qv', 's.embedding')}
           / (sqrt({_dot('q.qv', 'q.qv')}) * sqrt({_dot('s.embedding', 's.embedding')}))
               AS cos_sim
    FROM cells s, q
    WHERE s.cell IN (SELECT q_cell FROM probes) AND s.vec_id <> q.q_id
    ORDER BY cos_sim DESC, s.vec_id
    LIMIT 10
    """,
    tags=("llm", "similarity", "ann", "ivf", "nprobe"),
)
def llm_ivf_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with nprobe=2: the query scans its two nearest cells —
    proportionally more data for strictly-superset candidates (the standard
    recall knob of inverted-file indexes; see llm/similarity.py knn_ivf).
    Value-gated against an oracle that reproduces the probe ranking's
    (cosine desc, cid desc) tie-break exactly."""
    e = parallelize_compute(load_table(spark, sf_dir, "embeddings"))
    cents = [
        (int(r["vec_id"]), list(r["embedding"]))
        for r in e.filter(F.col("vec_id") < 8).select("vec_id", "embedding").collect()
    ]
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    return sim.knn_ivf(e, q, cents, k=10, nprobe=2)


@register(
    "llm_simhash",
    priority=0,
    oracle=f"""
    WITH tk AS (SELECT doc_id, list_distinct({_TOKS}) AS toks FROM documents),
    tb AS (SELECT doc_id,
                  list_transform(toks, t -> list_reduce(
                      list_transform(string_split(substring(md5(t), 1, 4), ''),
                                     c -> strpos('0123456789abcdef', c) - 1),
                      (a, x) -> a * 16 + x)) AS tok_bits
           FROM tk),
    sg AS (SELECT doc_id,
                  CAST(list_sum(list_transform(range(0, 16), b -> CASE WHEN
                      list_sum(list_transform(tok_bits, v ->
                          CASE WHEN CAST(FLOOR(v / POW(2, b)) AS BIGINT) % 2 = 1
                               THEN 1 ELSE -1 END)) > 0
                      THEN CAST(POW(2, b) AS BIGINT) ELSE 0 END)) AS BIGINT) AS simhash
           FROM tb)
    SELECT simhash, COUNT(*) AS n_docs, MIN(doc_id) AS keeper_doc
    FROM sg GROUP BY simhash ORDER BY simhash
    """,
    tags=("llm", "dedup", "simhash"),
)
def llm_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash signatures + signature-collision groups (near-dup by
    Hamming-0).  The oracle reproduces conv(hex,16,10) as a char fold, so
    the full bit-arithmetic path is value-checked."""
    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    sigs = d.select("doc_id", dd.simhash16("text").alias("simhash"))
    return (
        sigs.groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keeper_doc"))
        .orderBy("simhash")
    )


@register(
    "llm_knn_cosine",
    priority=0,
    oracle=f"""
    WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           {_dot('q.qv', 'e.embedding')}
           / (sqrt({_dot('q.qv', 'q.qv')}) * sqrt({_dot('e.embedding', 'e.embedding')}))
               AS cos_sim
    FROM embeddings e, q
    WHERE e.vec_id <> q.q_id
    ORDER BY cos_sim DESC, e.vec_id
    LIMIT 10
    """,
    tags=("llm", "similarity", "bench"),
)
def llm_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for query vec_id=0 — the exact-ANN
    baseline.  Query broadcast; corpus never moves; TakeOrdered top-k."""
    e = parallelize_compute(load_table(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    return sim.knn_brute(e, q, k=10)


def _sigs_cte(n_planes: int) -> str:
    """sigs CTE: sign-LSH bucket per vector (mirrors llm.similarity.
    lsh_signature — same hyperplane-weight arithmetic, one definition)."""
    return f"""sigs AS (
        SELECT vec_id, label, embedding,
               list_sum(list_transform(range(0, {n_planes}), p -> CASE WHEN
                   list_reduce(list_transform(list_zip(embedding, range(0, 64)),
                       z -> CAST(z[1] AS DOUBLE) * CAST(((p*31 + z[2]*17) % 7 - 3) AS DOUBLE)),
                       (acc, x) -> acc + x) > 0
                   THEN CAST(1 << p AS BIGINT) ELSE 0 END)) AS bucket
        FROM embeddings
    )"""


_SIGS_CTE = _sigs_cte(8) + """, q AS (SELECT vec_id AS q_id, embedding AS qv, bucket AS q_bucket
             FROM sigs WHERE vec_id = 0)"""


@register(
    "llm_lsh_ann",
    priority=0,
    oracle=f"""
    WITH {_SIGS_CTE}
    SELECT s.vec_id,
           {_dot('q.qv', 's.embedding')}
           / (sqrt({_dot('q.qv', 'q.qv')}) * sqrt({_dot('s.embedding', 's.embedding')}))
               AS cos_sim
    FROM sigs s, q
    WHERE s.bucket = q.q_bucket AND s.vec_id <> q.q_id
    ORDER BY cos_sim DESC, s.vec_id
    LIMIT 10
    """,
    tags=("llm", "similarity", "ann"),
)
def llm_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed ANN (the 100 TB scale path): 8 deterministic
    hyperplanes → bucket id → exact cosine within the query's bucket only.
    Recall tested against llm_knn_cosine in pytest."""
    e = parallelize_compute(load_table(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    return sim.knn_lsh(e, q, k=10, n_planes=8)


@register(
    "llm_knn_join",
    priority=0,
    oracle="WITH " + _sigs_cte(6) + f""",
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               {_dot('a.embedding', 'b.embedding')}
               / (sqrt({_dot('a.embedding', 'a.embedding')})
                  * sqrt({_dot('b.embedding', 'b.embedding')})) AS cos_sim
        FROM sigs a JOIN sigs b
          ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    ),
    ranked AS (
        SELECT id_a, id_b, cos_sim,
               ROW_NUMBER() OVER (PARTITION BY id_a
                                  ORDER BY cos_sim DESC, id_b) AS rank
        FROM pairs
    )
    SELECT id_a, id_b, cos_sim, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 5
    """,
    tags=("llm", "similarity", "knnjoin", "bench"),
)
def llm_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked k-NN join: top-5 neighbors for every vector, LSH-bucket
    blocked (6 planes) — the nearest-neighbor-graph / embedding-dedup
    workload.  Pair space = Σ|bucket|², never N²."""
    e = parallelize_compute(load_table(spark, sf_dir, "embeddings"))
    return sim.knn_join(e, k=5, n_planes=6)


def _capped_knn_tail(cap: int, k: int) -> str:
    """The split-cap + Hamming-1-reprobe k-NN join CTE chain, parameterized
    on the bucket cap and k — mirrors llm/similarity.lsh_blocks/knn_join
    operation-for-operation (integer bit-length split sizing, id-mix
    sub-bucket hash, probe flips).  Shared by the pinned capped query and
    the auto-sized query so the split arithmetic has ONE SQL definition."""
    return f"""hot AS (
        SELECT bucket, COUNT(*) AS cnt FROM sigs GROUP BY bucket
        HAVING COUNT(*) > {cap}
    ),
    blk AS (
        SELECT s.vec_id, s.embedding, s.bucket,
               CASE WHEN h.cnt IS NULL THEN 0
                    WHEN CAST(FLOOR((h.cnt + {cap - 1}) / {cap}.0) AS BIGINT) <= 1 THEN 0
                    ELSE LEAST(length(bin(
                        CAST(FLOOR((h.cnt + {cap - 1}) / {cap}.0) AS BIGINT) - 1)), 8)
               END AS split_bits
        FROM sigs s LEFT JOIN hot h USING (bucket)
    ),
    sb AS (
        SELECT *, CASE WHEN split_bits = 0 THEN 0
                       ELSE ((vec_id * 31 + 7) % 1000003)
                            % CAST(POW(2, split_bits) AS BIGINT)
                  END AS sub
        FROM blk
    ),
    probes AS (
        SELECT vec_id, embedding, bucket,
               unnest(CASE WHEN split_bits = 0 THEN [sub]
                      ELSE list_concat([sub],
                           list_transform(range(0, split_bits),
                               p -> xor(sub, CAST(POW(2, p) AS BIGINT))))
                      END) AS psub
        FROM sb
    ),
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               {_dot('a.embedding', 'b.embedding')}
               / (sqrt({_dot('a.embedding', 'a.embedding')})
                  * sqrt({_dot('b.embedding', 'b.embedding')})) AS cos_sim
        FROM probes a JOIN sb b
          ON a.bucket = b.bucket AND a.psub = b.sub AND a.vec_id <> b.vec_id
    ),
    ranked AS (
        SELECT id_a, id_b, cos_sim,
               ROW_NUMBER() OVER (PARTITION BY id_a
                                  ORDER BY cos_sim DESC, id_b) AS rank
        FROM pairs
    )
    SELECT id_a, id_b, cos_sim, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {k}
    """


@register(
    "llm_knn_join_capped",
    oracle="WITH " + _sigs_cte(2) + ",\n" + _capped_knn_tail(cap=64, k=3),
    tags=("llm", "similarity", "knnjoin", "capped"),
)
def llm_knn_join_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-hardened k-NN join path: 2 planes force oversized buckets
    at sf0.01, so the bucket-size cap (64) actually splits — uniform
    id-hash sub-buckets + Hamming-1 reprobe (see llm/similarity.py
    lsh_blocks/knn_join).  The oracle reproduces the split arithmetic
    (integer bit-length, id mix, probe flips) operation-for-operation, so
    the entire capped blocking layer is value-checked, not just the happy
    path."""
    e = parallelize_compute(load_table(spark, sf_dir, "embeddings"))
    return sim.knn_join(e, k=3, n_planes=2, max_bucket_size=64)


@register(
    "llm_embedding_neardup",
    oracle="WITH " + _sigs_cte(4) + f""",
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               {_dot('a.embedding', 'b.embedding')}
               / (sqrt({_dot('a.embedding', 'a.embedding')})
                  * sqrt({_dot('b.embedding', 'b.embedding')})) AS cos_sim
        FROM sigs a JOIN sigs b
          ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cos_sim FROM pairs
    WHERE cos_sim >= 0.35
    ORDER BY id_a, id_b
    """,
    tags=("llm", "similarity", "dedup"),
)
def llm_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: every unordered vector pair
    with cosine ≥ τ, LSH-blocked so candidates only meet inside their
    4-plane sign bucket — the semantic-dedup stage of a training-data
    pipeline (MinHash catches lexical dups, this catches paraphrases).

    Same Σ|bucket|²-not-N² shape as ``llm_knn_join``; at 100 TB the
    plane count comes from ``derive_n_planes`` and oversized buckets
    split+reprobe (``blocked_pairs(max_bucket_size=...)``) — pinned here
    to 4 fixed planes/no cap so the oracle replicates the exact blocking.
    """
    e = parallelize_compute(load_table(spark, sf_dir, "embeddings"))
    pairs = sim.blocked_pairs(e, n_planes=4, ordered=True)
    return pairs.filter(F.col("cos_sim") >= 0.35).orderBy("id_a", "id_b")


@register(
    "llm_lsh_multiprobe",
    oracle=f"""
    WITH {_SIGS_CTE},
    probes AS (
        SELECT q_id, qv,
               unnest([q_bucket] || list_transform(range(0, 8),
                   p -> xor(q_bucket, CAST(POW(2, p) AS BIGINT)))) AS probe_bucket
        FROM q
    )
    SELECT DISTINCT s.vec_id,
           {_dot('p.qv', 's.embedding')}
           / (sqrt({_dot('p.qv', 'p.qv')}) * sqrt({_dot('s.embedding', 's.embedding')}))
               AS cos_sim
    FROM sigs s JOIN probes p ON s.bucket = p.probe_bucket
    WHERE s.vec_id <> p.q_id
    ORDER BY cos_sim DESC, s.vec_id
    LIMIT 10
    """,
    tags=("llm", "similarity", "ann", "multiprobe"),
)
def llm_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN: the query's bucket plus all Hamming-1 buckets
    (one hyperplane flip) — recovers the boundary misses that dominate
    single-probe recall loss, still touching ≤ (n_planes+1)/2^n_planes of
    the corpus in expectation."""
    e = parallelize_compute(load_table(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    return sim.knn_lsh_multiprobe(e, q, k=10, n_planes=8)


@register(
    "llm_label_blocked_pairs",
    priority=1,
    oracle="WITH " + _sigs_cte(4) + f"""
    , pairs AS (
        SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
               {_dot('a.embedding', 'b.embedding')}
               / (sqrt({_dot('a.embedding', 'a.embedding')})
                  * sqrt({_dot('b.embedding', 'b.embedding')})) AS cos_sim
        FROM sigs a JOIN sigs b
          ON a.label = b.label AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT label,
           COUNT(*) AS n_pairs,
           COUNT(CASE WHEN cos_sim > 0.9 THEN 1 END) AS high_sim_pairs,
           CAST(SUM(CAST(FLOOR(cos_sim * 1e12) AS BIGINT)) AS DOUBLE)
               / COUNT(*) / 1e12 AS avg_cos
    FROM pairs GROUP BY label ORDER BY label
    """,
    tags=("llm", "similarity", "neardup", "blocked"),
)
def llm_label_blocked_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-label LSH-blocked candidate pairs via
    ``blocked_pairs(extra_key_cols=("label",))`` — the per-key blocking path
    (sizing, splitting, and the candidate join all keyed by
    (label, bucket)): pairs only form inside a label AND an LSH bucket, the
    composition a 100 TB per-language / per-source dedup actually runs.
    Oracle reproduces the signature arithmetic and the (label, bucket)
    equi-join exactly."""
    e = parallelize_compute(load_table(spark, sf_dir, "embeddings"))
    pairs = sim.blocked_pairs(
        e, n_planes=4, extra_key_cols=("label",), ordered=True
    )
    return (
        pairs.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.count(F.when(F.col("cos_sim") > 0.9, 1)).alias("high_sim_pairs"),
            (
                F.sum(F.floor(F.col("cos_sim") * 1e12).cast("decimal(38,0)")).cast(
                    "double"
                )
                / F.count(F.lit(1))
                / F.lit(1e12)
            ).alias("avg_cos"),
        )
        .orderBy("label")
    )


@register(
    "llm_label_similarity",
    oracle=f"""
    WITH pairs AS (
        SELECT a.label,
               {_dot('a.embedding', 'b.embedding')}
               / (sqrt({_dot('a.embedding', 'a.embedding')})
                  * sqrt({_dot('b.embedding', 'b.embedding')})) AS cos_sim
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
    )
    SELECT label,
           COUNT(*) AS n_pairs,
           COUNT(CASE WHEN cos_sim > 0.9 THEN 1 END) AS high_sim_pairs,
           CAST(SUM(CAST(FLOOR(cos_sim * 1e12) AS BIGINT)) AS DOUBLE)
               / COUNT(*) / 1e12 AS avg_cos
    FROM pairs GROUP BY label ORDER BY label
    """,
    tags=("llm", "similarity", "neardup"),
)
def llm_label_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup stats with label blocking: pairwise cosine
    within label only (blocking keeps it O(Σ|block|²), never all-pairs;
    at scale the block key is the LSH bucket instead)."""
    e = parallelize_compute(load_table(spark, sf_dir, "embeddings"))
    a = e.select(
        F.col("label"), F.col("vec_id").alias("id_a"), F.col("embedding").alias("va")
    )
    b = e.select(
        F.col("label"), F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb")
    )
    pairs = a.join(b, "label").filter(F.col("id_a") < F.col("id_b"))
    cos = sim.cosine(F.col("va"), F.col("vb"))
    return (
        pairs.select("label", cos.alias("cos_sim"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.count(F.when(F.col("cos_sim") > 0.9, 1)).alias("high_sim_pairs"),
            # floor-quantize to 1e-12 before the exact integer sum: floor has
            # no rounding-tie ambiguity, unlike double→decimal casts which
            # round differently across engines (decimal(38,0) so the sum
            # can't overflow at 100 TB pair counts).
            (
                F.sum(F.floor(F.col("cos_sim") * 1e12).cast("decimal(38,0)")).cast(
                    "double"
                )
                / F.count(F.lit(1))
                / F.lit(1e12)
            ).alias("avg_cos"),
        )
        .orderBy("label")
    )


@register(
    "llm_image_metadata",
    oracle="""
    WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n,
                      substring(text, 1, 64) AS head
               FROM documents)
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_bytes,
           CAST(n % 64 + 1 AS INTEGER) AS width,
           CAST((n * 7) % 64 + 1 AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS channels,
           CAST(list_sum(list_transform(string_split(head, ''), c -> ascii(c))) AS DOUBLE)
               / len(string_split(head, '')) AS mean_byte
    FROM b
    """,
    tags=("llm", "multimodal", "pandas-udf"),
)
def llm_image_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: binary payload column →
    ``mapInPandas`` Arrow-batched decode (deterministic fake codec — see
    llm/multimodal.py) → typed metadata.  The oracle reproduces the fake
    codec's integer arithmetic, so the whole Python-batch path is
    value-checked, not just row-counted.  (Payload = utf-8 text bytes; the
    corpus is ASCII so bytes ≡ chars in the oracle.)"""
    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    return mm.image_metadata(mm.with_binary_payload(d))


@register(
    "llm_pii_scrub",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '(https?://\S+)|(\S+@\S+\.\S+)')) AS BIGINT)
               AS n_redactions,
           CAST(len(regexp_replace(text, '(https?://\S+)|(\S+@\S+\.\S+)',
                                   '<REDACTED>', 'g')) AS BIGINT) AS n_chars_scrubbed
    FROM documents
    """,
    tags=("llm", "text", "scrub"),
)
def llm_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL/email scrubbing — the PII-redaction pass every training-data
    pipeline runs before tokenization.  Pure regexp projection: scan-speed,
    no shuffle; the redaction count + scrubbed length are value-checked."""
    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    pat = r"(https?://\S+)|(\S+@\S+\.\S+)"
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), 0))
        .cast("long")
        .alias("n_redactions"),
        F.length(F.regexp_replace(F.col("text"), pat, "<REDACTED>"))
        .cast("long")
        .alias("n_chars_scrubbed"),
    )


@register(
    "llm_repetition",
    oracle=f"""
    WITH tk AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id, {_SH3} AS s FROM tk)
    SELECT doc_id,
           CAST(len(s) AS BIGINT) AS n_shingles,
           CAST(len(list_distinct(s)) AS BIGINT) AS n_distinct_shingles,
           1.0 - CAST(len(list_distinct(s)) AS DOUBLE) / CAST(len(s) AS DOUBLE)
               AS rep_ratio
    FROM sh
    """,
    tags=("llm", "text", "quality"),
)
def llm_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate 3-gram fraction (Gopher-style repetition filter): share of
    shingles that repeat within the doc.  High rep_ratio → boilerplate /
    degenerate text; a standard pre-training quality gate."""
    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    s = tx.shingles("text", 3)
    n = F.size(s).cast("long")
    nd = F.size(F.array_distinct(s)).cast("long")
    return d.select(
        "doc_id",
        n.alias("n_shingles"),
        nd.alias("n_distinct_shingles"),
        (F.lit(1.0) - nd.cast("double") / n.cast("double")).alias("rep_ratio"),
    )


@register(
    "llm_audio_metadata",
    oracle="""
    WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n,
                      substring(text, 1, 64) AS head
               FROM documents)
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_bytes,
           CAST(8000 + (n % 8) * 1000 AS INTEGER) AS sample_rate,
           CAST(n * 4 AS BIGINT) AS n_samples,
           CAST(n * 4 AS DOUBLE) / (8000 + (n % 8) * 1000) AS duration_s,
           sqrt(CAST(list_sum(list_transform(string_split(head, ''),
                                             c -> ascii(c) * ascii(c))) AS DOUBLE)
                / len(string_split(head, ''))) AS rms
    FROM b
    """,
    tags=("llm", "multimodal", "pandas-udf"),
)
def llm_audio_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio plumbing end-to-end: binary payload → Arrow-batched
    ``mapInPandas`` decode (deterministic fake codec; ``decoder="real"``
    switches to soundfile / stdlib-WAV decoding, see llm/multimodal.py) →
    sample-rate/duration/RMS metadata, value-checked against the oracle's
    integer arithmetic."""
    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    return mm.audio_metadata(mm.with_binary_payload(d))


@register(
    "llm_bpe_tokens",
    oracle=r"""
    WITH tk AS (SELECT doc_id,
                       regexp_extract_all(lower(text), '[a-z0-9_]+|[^\sa-z0-9_]') AS t
                FROM documents)
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS n_bpe_tokens,
           CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct,
           CAST(len(list_filter(t, x -> NOT regexp_matches(x, '[a-z0-9_]'))) AS BIGINT)
               AS n_punct
    FROM tk
    """,
    tags=("llm", "text", "tokenizer"),
)
def llm_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex tokenization (word pieces + single punctuation marks —
    the pre-tokenizer split GPT-style BPE vocabularies assume), counted per
    doc.  Complements the whitespace tokenizer in llm_token_stats."""
    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    t = F.regexp_extract_all(
        F.lower(F.col("text")), F.lit(r"[a-z0-9_]+|[^\sa-z0-9_]"), 0
    )
    return d.select(
        "doc_id",
        F.size(t).cast("long").alias("n_bpe_tokens"),
        F.size(F.array_distinct(t)).cast("long").alias("n_distinct"),
        F.size(F.filter(t, lambda x: ~x.rlike("[a-z0-9_]"))).cast("long").alias(
            "n_punct"
        ),
    )


@register(
    "llm_incremental_dedup",
    priority=1,
    oracle="WITH " + must_replace(
        _MINHASH_CTES,
        """cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b
               ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
              AND a.doc_id < b.doc_id),""",
        """cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b
               ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
              AND a.doc_id % 3 = 0 AND b.doc_id % 3 <> 0),""",
    ) + """
    SELECT doc_a AS doc_new, doc_b AS doc_existing, jaccard
    FROM j WHERE jaccard > 0.5
    """,
    tags=("llm", "dedup", "incremental"),
)
def llm_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production dedup shape: a new batch (every 3rd doc plays the
    incoming crawl) checked against the already-ingested corpus via an
    asymmetric band-bucket join — never a corpus×corpus self-join (see
    llm/dedup.py incremental_neardup).  Same signature family and exact-
    Jaccard verification as llm_minhash_neardup; the oracle splits its
    band CTE into the same incoming/existing sides."""
    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    incoming = d.filter(F.col("doc_id") % 3 == 0)
    corpus = d.filter(F.col("doc_id") % 3 != 0)
    return dd.incremental_neardup(incoming, corpus, threshold=0.5)


@register(
    "llm_corpus_report",
    priority=1,
    oracle=f"""
    WITH tk AS (SELECT doc_id, lang, source, text, {_TOKS} AS t FROM documents)
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(len(t)) AS BIGINT) AS total_tokens,
           COUNT(DISTINCT md5(text)) AS distinct_content,
           CAST(MIN(len(t)) AS BIGINT) AS min_tokens,
           CAST(MAX(len(t)) AS BIGINT) AS max_tokens
    FROM tk GROUP BY lang, source ORDER BY lang, source
    """,
    tags=("llm", "curation", "report"),
)
def llm_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset-card rollup: per (lang, source) stratum — doc counts,
    exact token totals (integer sums, engine-independent), distinct-content
    count (exact dup rate), token-length extremes.  One shuffle on the
    stratum key; the mixture table every curation pipeline publishes."""
    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    n_tok = F.size(tx.tokens("text")).cast("long")
    return (
        d.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_tok).alias("total_tokens"),
            F.countDistinct(F.md5("text")).alias("distinct_content"),
            F.min(n_tok).alias("min_tokens"),
            F.max(n_tok).alias("max_tokens"),
        )
        .orderBy("lang", "source")
    )


@register(
    "llm_decontamination",
    priority=1,
    oracle=f"""
    WITH tk AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id, list_distinct(list_transform({_SH3}, s -> md5(s))) AS s
           FROM tk),
    bench AS (SELECT DISTINCT u.sh FROM sh, UNNEST(s) u(sh) WHERE doc_id % 97 = 0)
    SELECT DISTINCT d.doc_id FROM sh d, UNNEST(d.s) u(sh)
    WHERE d.doc_id % 97 <> 0 AND u.sh IN (SELECT sh FROM bench)
    ORDER BY doc_id
    """,
    tags=("llm", "curation", "decontamination"),
)
def llm_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval overlap scrub: corpus docs sharing any n-gram shingle with
    the benchmark set (here: every 97th doc plays the eval suite; n=3 for
    these short synthetic docs — production uses 13).  Corpus side is a
    narrow digest projection; the tiny benchmark shingle set broadcasts
    into a left-semi join — scan-speed flagging, no corpus shuffle (see
    llm/dedup.py contaminated_doc_ids)."""
    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    corpus = d.filter(F.col("doc_id") % 97 != 0)
    benchmark = d.filter(F.col("doc_id") % 97 == 0)
    return dd.contaminated_doc_ids(corpus, benchmark, n=3).orderBy("doc_id")


@register(
    "llm_ivf_trained",
    priority=1,
    oracle="""
    SELECT COUNT(*) AS n_vectors, TRUE AS cells_bounded,
           TRUE AS objective_improved
    FROM embeddings
    """,
    tags=("llm", "similarity", "ivf", "kmeans"),
)
def llm_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained IVF quantizer under an invariant gate: distributed spherical
    k-means (llm/similarity.train_ivf_centroids — deterministic md5 init,
    literal-centroid assignment, exact-decimal per-(cell,dim) means) must
    cover every vector, use at most k cells, and never worsen the
    spherical-k-means objective vs its init.  The booleans are computed
    Spark-side from the actual training run (the rl_ema_scan pattern:
    value-gating a result a static oracle can't reproduce)."""
    e = parallelize_compute(load_table(spark, sf_dir, "embeddings")).persist()
    init = sim.train_ivf_centroids(e, k=8, n_iter=0)
    trained = sim.train_ivf_centroids(e, k=8, n_iter=2, init=init)
    n, cells_used, obj0, obj2 = sim.training_report(e, init, trained)
    e.unpersist()
    return spark.createDataFrame(
        [(n, 1 <= cells_used <= 8, obj2 >= obj0 - 1e-12)],
        "n_vectors bigint, cells_bounded boolean, objective_improved boolean",
    )


_SAMPLE_RATES = {"en": 0.25, "de": 1.0, "zh": 0.5}
_SAMPLE_DEFAULT = 0.1


@register(
    "llm_quality_topk_per_lang",
    priority=1,
    oracle="WITH " + _QUALITY_CTES + """
    SELECT lang, doc_id, quality, rank FROM (
        SELECT lang, doc_id, quality,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY quality DESC, doc_id) AS rank
        FROM q)
    WHERE rank <= 20
    """,
    tags=("llm", "curation", "selection"),
)
def llm_quality_topk_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data selection under a per-stratum budget: the top-20 docs per lang
    by quality score — the "keep the best N per slice" pass that follows
    scoring in a curation pipeline.  Per-stratum window (shuffle on lang,
    heap-free row_number with a total order: quality desc, doc_id), never a
    global sort; the quality expression is the already-gated
    llm_quality_scores arithmetic, so the ordering is engine-exact."""
    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    scored = d.select("lang", "doc_id", tx.quality_score("text").alias("quality"))
    w = Window.partitionBy("lang").orderBy(F.desc("quality"), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 20)
        .select("lang", "doc_id", "quality", "rank")
    )


@register(
    "llm_stratified_sample",
    priority=1,
    oracle=f"""
    SELECT doc_id, lang, source FROM documents
    WHERE md5(CAST(doc_id AS VARCHAR)) <
          CASE WHEN lang = 'de' THEN '{sa.rate_threshold(1.0)}'
               WHEN lang = 'en' THEN '{sa.rate_threshold(0.25)}'
               WHEN lang = 'zh' THEN '{sa.rate_threshold(0.5)}'
               ELSE '{sa.rate_threshold(0.1)}' END
    """,
    tags=("llm", "curation", "sampling"),
)
def llm_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling — the data-mixture knob of a
    training pipeline (downsample crawl-like strata, keep books-like ones).
    Keep iff md5(doc_id) under the stratum's hex rate threshold: pure
    projection+filter, scan-speed at any corpus size, no RNG state, exact
    across engines (lexicographic hex compare ≡ numeric at equal length;
    see llm/sampling.py)."""
    d = load_table(spark, sf_dir, "documents")
    return sa.stratified_sample(
        d, _SAMPLE_RATES, strata_col="lang", default_rate=_SAMPLE_DEFAULT
    ).select("doc_id", "lang", "source")


@register(
    "llm_shard_assignment",
    priority=1,
    oracle="""
    SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS shuffle_key,
           CAST((row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1) % 8
                AS INTEGER) AS shard
    FROM documents
    """,
    tags=("llm", "curation", "shuffle"),
)
def llm_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + round-robin sharding: every training
    run reads byte-identical shards (md5 order is the permutation — no RNG
    state to lose).  The global rank is the distributed range-partition
    machinery (with_global_rank — no single-partition window; the oracle's
    row_number() is the semantics, not the plan), shard sizes differ by ≤1."""
    d = load_table(spark, sf_dir, "documents")
    return sa.shard_assignment(d, n_shards=8).select("doc_id", "shuffle_key", "shard")


@register(
    "llm_pack_sequences",
    priority=1,
    oracle=f"""
    WITH t AS (SELECT source AS stream, doc_id,
                      CAST(len({_TOKS}) AS BIGINT) AS n_tokens
               FROM documents),
    c AS (SELECT stream, doc_id, n_tokens,
                 CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY stream ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                     AS tokens_before
          FROM t)
    SELECT stream, doc_id, n_tokens, tokens_before,
           CAST(FLOOR(tokens_before / 2048) AS BIGINT) AS chunk_id
    FROM c
    """,
    tags=("llm", "curation", "packing"),
)
def llm_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: docs laid head-to-tail per stream,
    cut every 2048 tokens; a doc's chunk is the window its first token lands
    in.  Integer window-cumsum arithmetic — exact, engine-independent; one
    shuffle on the stream key (shard-grained at scale; see
    llm/sampling.py pack_sequences)."""
    d = load_table(spark, sf_dir, "documents")
    return sa.pack_sequences(d, window_tokens=2048, stream_col="source")


@register(
    "llm_frame_sample",
    oracle="""
    WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
    SELECT doc_id, i AS frame_idx, CAST(n AS BIGINT) AS n_bytes
    FROM b, LATERAL unnest(range(0, GREATEST(CAST(FLOOR((n - 1) / 256.0) AS INTEGER), 0) + 1)) t(i)
    WHERE i % 16 = 0
    """,
    tags=("llm", "multimodal"),
)
def llm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling shape: payload → frame offsets → keep
    every 16th (explode of a generated sequence; narrow, scan-speed)."""
    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    return mm.frame_sample(mm.with_binary_payload(d), every_n=16)


# Oracle fragment: 3-gram shingle strings from token list ``t`` (mirrors
# llm.text.shingles(n=3): same slice bounds, same space join).
_SHINGLES3 = "list_transform(range(1, greatest(len(t) - 2, 1) + 1), i -> array_to_string(t[i:i+2], ' '))"

# Shared CTEs: per-doc distinct 3-grams and their document frequency.
_NGRAM_DF_CTES = f"""t AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id, unnest(list_distinct({_SHINGLES3})) AS ngram FROM t),
    dfq AS (SELECT ngram, COUNT(*) AS df FROM sh GROUP BY ngram)"""


@register(
    "llm_boilerplate_ngrams",
    oracle=f"""
    WITH {_NGRAM_DF_CTES}
    SELECT ngram, df FROM dfq
    WHERE df >= 5
    ORDER BY df DESC, ngram
    LIMIT 100
    """,
    tags=("llm", "text", "boilerplate"),
)
def llm_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequent 3-grams (cross-document boilerplate detection, the
    CCNet/RefinedWeb repetition signal): per-doc-distinct shingle explode →
    df count → floor + bounded top-k on the total order (df desc, ngram).
    Map-side partial aggregation; TakeOrdered, no global sort."""
    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    return tx.frequent_ngrams(d, n=3, min_df=5, limit=100)


@register(
    "llm_doc_boilerplate",
    oracle=f"""
    WITH {_NGRAM_DF_CTES},
    freq AS (SELECT ngram FROM dfq WHERE df >= 5 ORDER BY df DESC, ngram LIMIT 1000),
    per_doc AS (SELECT doc_id, COUNT(*) AS n_ngrams FROM sh GROUP BY doc_id),
    hits AS (
        SELECT sh.doc_id, COUNT(*) AS boiler_ngrams
        FROM sh JOIN freq USING (ngram) GROUP BY sh.doc_id
    )
    SELECT p.doc_id, p.n_ngrams,
           COALESCE(h.boiler_ngrams, 0) AS boiler_ngrams,
           CAST(COALESCE(h.boiler_ngrams, 0) AS DOUBLE)
               / CAST(p.n_ngrams AS DOUBLE) AS boiler_ratio
    FROM per_doc p LEFT JOIN hits h USING (doc_id)
    ORDER BY boiler_ratio DESC, p.doc_id
    LIMIT 20
    """,
    tags=("llm", "text", "boilerplate"),
)
def llm_doc_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boilerplate share: fraction of a doc's distinct 3-grams
    that sit in the bounded corpus-frequent list (broadcast), top-20 most
    boilerplate-heavy docs — the doc-level filter built on
    llm_boilerplate_ngrams' corpus-level signal.  Both aggregations share
    the doc_id shuffle key; the frequent list is broadcast by construction."""
    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    return (
        tx.boilerplate_ratio(d, n=3, min_df=5, limit=1000)
        .orderBy(F.desc("boiler_ratio"), "doc_id")
        .limit(20)
    )


@register(
    "llm_mixture_weights",
    oracle=rf"""
    WITH per AS (
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(len({_TOKS})) AS BIGINT) AS tokens
        FROM documents GROUP BY source
    ),
    tot AS (SELECT SUM(tokens) AS total_tokens, COUNT(*) AS n_sources FROM per)
    SELECT source, n_docs, tokens,
           CAST(tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE) AS actual_share,
           (1.0 / CAST(n_sources AS DOUBLE))
               / (CAST(tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE)) AS weight,
           CAST(tokens AS DOUBLE) * LEAST(
               (1.0 / CAST(n_sources AS DOUBLE))
                   / (CAST(tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE)),
               1.0) AS sampled_tokens
    FROM per, tot
    ORDER BY source
    """,
    tags=("llm", "curation", "mixture"),
)
def llm_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture resampling weights toward a uniform-over-sources token
    mix (DoReMi/Pile-style): one groupBy(source) token aggregation + a
    single-row broadcast of the totals.  weight>1 = under-represented
    (repeat/up-sample); sampled_tokens = the budget under pure
    down-sampling (weight capped at 1)."""
    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    return sa.mixture_weights(d).orderBy("source")


@register(
    "llm_vocab_coverage",
    oracle=rf"""
    WITH tok AS (
        SELECT unnest({_TOKS}) AS token FROM documents
    ),
    counts AS (SELECT token, COUNT(*) AS n_occurrences FROM tok GROUP BY token),
    tot AS (SELECT CAST(SUM(n_occurrences) AS BIGINT) AS total FROM counts),
    top AS (
        SELECT token, n_occurrences,
               ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, token) AS rank,
               SUM(n_occurrences) OVER (ORDER BY n_occurrences DESC, token
                                        ROWS UNBOUNDED PRECEDING) AS cum
        FROM counts ORDER BY n_occurrences DESC, token LIMIT 50
    )
    SELECT CAST(rank AS BIGINT) AS rank, token, n_occurrences,
           CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) AS cum_coverage
    FROM top, tot
    ORDER BY rank
    """,
    tags=("llm", "text", "vocab"),
)
def llm_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary sizing curve: top-50 tokens by occurrence with
    cumulative corpus coverage.  Corpus side is one partial-aggregated
    count + TakeOrdered; the cumulative window runs on the 50-row
    (model-size) vocab only."""
    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    return tx.vocab_coverage(d, top_k=50)


@register(
    "llm_embedding_stats",
    oracle="""
    WITH x AS (
        SELECT i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS v,
               CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 10000000.0) AS BIGINT) AS iv
        FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
    ),
    per AS (
        SELECT dim, COUNT(*) AS n,
               SUM(CAST(iv AS DECIMAL(38,0))) AS s,
               SUM(CAST(iv * iv AS DECIMAL(38,0))) AS sq,
               MIN(v) AS min_v, MAX(v) AS max_v
        FROM x GROUP BY dim
    )
    SELECT CAST(dim AS INTEGER) AS dim, n,
           (CAST(s AS DOUBLE) / 10000000.0) / CAST(n AS DOUBLE) AS mean_v,
           (CAST(sq AS DOUBLE) / 100000000000000.0) / CAST(n AS DOUBLE)
               - ((CAST(s AS DOUBLE) / 10000000.0) / CAST(n AS DOUBLE))
                 * ((CAST(s AS DOUBLE) / 10000000.0) / CAST(n AS DOUBLE)) AS var_v,
           min_v, max_v
    FROM per
    ORDER BY dim
    """,
    tags=("llm", "similarity", "profile"),
)
def llm_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding statistics (centering/whitening pass before
    ANN indexing): posexplode + groupBy(dim), exact-decimal sums so means
    and variances are bit-identical at any partitioning; d output rows."""
    e = parallelize_compute(load_table(spark, sf_dir, "embeddings"))
    return sim.embedding_dim_stats(e).orderBy("dim")


@register(
    "llm_filtered_knn",
    oracle=f"""
    WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           {_dot('q.qv', 'e.embedding')}
           / (sqrt({_dot('q.qv', 'q.qv')}) * sqrt({_dot('e.embedding', 'e.embedding')}))
               AS cos_sim
    FROM embeddings e, q
    WHERE e.label = 1 AND e.vec_id <> q.q_id
    ORDER BY cos_sim DESC, e.vec_id
    LIMIT 10
    """,
    tags=("llm", "similarity", "filtered"),
)
def llm_filtered_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered exact ANN (the RAG workload: nearest neighbors
    *within a predicate*): the label filter is applied to the corpus scan
    BEFORE the broadcast-query join, so candidate cost is the filtered
    partition, not the corpus."""
    e = parallelize_compute(load_table(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    return sim.knn_brute(e.filter(F.col("label") == 1), q, k=10)


@register(
    "llm_content_split",
    oracle=f"""
    WITH tagged AS (
        SELECT doc_id, md5(text) AS c,
               CASE WHEN md5(text) < '{sa.rate_threshold(0.8)}' THEN 'train' ELSE 'val' END AS split
        FROM documents
    ),
    per AS (
        SELECT c, COUNT(DISTINCT split) AS ns, COUNT(*) AS nd, MIN(split) AS split
        FROM tagged GROUP BY c
    ),
    leak AS (SELECT CAST(COUNT(*) FILTER (ns > 1) AS BIGINT) AS l FROM per)
    SELECT split, CAST(SUM(nd) AS BIGINT) AS n_docs,
           COUNT(*) AS distinct_contents, l AS contents_in_both_splits
    FROM per, leak
    GROUP BY split, l
    ORDER BY split
    """,
    tags=("llm", "curation", "split"),
)
def llm_content_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val split audit: the split key is the CONTENT
    hash, so exact duplicates can never straddle train and validation; the
    gated output carries the computed (not asserted) leak count, which is
    structurally zero."""
    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    return sa.leakage_safe_split(d, train_rate=0.8)


# Incremental (incoming % 3 = 0 vs corpus) minhash CTEs with the token CTE
# renamed tkm so they can coexist with _QUALITY_CTES (which owns ``tk``).
_INC_MINHASH_CTES = must_replace(
    must_replace(
        must_replace(
            _MINHASH_CTES,
            """cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b
               ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
              AND a.doc_id < b.doc_id),""",
            """cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b
               ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
              AND a.doc_id % 3 = 0 AND b.doc_id % 3 <> 0),""",
        ),
        "tk AS (SELECT doc_id,",
        "tkm AS (SELECT doc_id,",
    ),
    "FROM tk),",
    "FROM tkm),",
)


@register(
    "llm_curation_gate",
    oracle="WITH " + _INC_MINHASH_CTES + ",\n    " + _QUALITY_CTES + """,
    flagged AS (SELECT DISTINCT doc_a AS doc_id FROM j WHERE jaccard > 0.5)
    SELECT q.doc_id, q.quality FROM q
    WHERE q.doc_id % 3 = 0
      AND q.quality >= 0.4
      AND q.doc_id NOT IN (SELECT doc_id FROM flagged)
    ORDER BY q.doc_id
    """,
    tags=("llm", "curation", "gate"),
)
def llm_curation_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed continuous-ingestion curation gate, batch twin of
    streaming ``make_curation_batch_fn``: incoming docs (doc_id % 3 = 0,
    the crawl batch) are near-dup-checked against the corpus at rest
    (asymmetric band join — never corpus²), quality-gated (≥ 0.4), and the
    survivors emitted with their scores.  Flagging runs on the full batch,
    independent of the quality gate, so per-micro-batch acceptance unions
    to exactly this one-shot result (streaming parity tested)."""
    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    incoming = d.filter(F.col("doc_id") % 3 == 0)
    corpus = d.filter(F.col("doc_id") % 3 != 0)
    flagged = (
        dd.incremental_neardup(incoming, corpus, threshold=0.5)
        .select(F.col("doc_new").alias("doc_id"))
        .distinct()
    )
    return (
        incoming.withColumn("quality", tx.quality_score(F.col("text")))
        .filter(F.col("quality") >= 0.4)
        .join(flagged, "doc_id", "left_anti")
        .select("doc_id", "quality")
        .orderBy("doc_id")
    )


def _sigs_cte_dynamic(target_bucket_size: int) -> str:
    """sigs CTE with the plane count DERIVED from the corpus size — the SQL
    twin of llm.similarity.derive_n_planes (ceil(log2(N/target)) clamped to
    [1,24]), so the auto-sized scale path is value-gated, not just the
    pinned-plane plans.  Same hyperplane arithmetic as ``_sigs_cte``."""
    return f"""np AS (
        SELECT LEAST(24, GREATEST(1, CAST(CEIL(LOG2(
                   CAST(COUNT(*) AS DOUBLE) / {target_bucket_size}.0)) AS INTEGER))) AS p
        FROM embeddings
    ),
    sigs AS (
        SELECT vec_id, label, embedding,
               list_sum(list_transform(range(0, (SELECT p FROM np)), pl -> CASE WHEN
                   list_reduce(list_transform(list_zip(embedding, range(0, 64)),
                       z -> CAST(z[1] AS DOUBLE) * CAST(((pl*31 + z[2]*17) % 7 - 3) AS DOUBLE)),
                       (acc, x) -> acc + x) > 0
                   THEN CAST(1 << pl AS BIGINT) ELSE 0 END)) AS bucket
        FROM embeddings
    )"""


@register(
    "llm_embedding_neardup_auto",
    oracle="WITH " + _sigs_cte_dynamic(64) + f""",
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               {_dot('a.embedding', 'b.embedding')}
               / (sqrt({_dot('a.embedding', 'a.embedding')})
                  * sqrt({_dot('b.embedding', 'b.embedding')})) AS cos_sim
        FROM sigs a JOIN sigs b
          ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cos_sim FROM pairs
    WHERE cos_sim >= 0.35
    ORDER BY id_a, id_b
    """,
    tags=("llm", "similarity", "dedup", "auto"),
)
def llm_embedding_neardup_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The AUTO-SIZED embedding near-dup — the actual 100 TB path, oracle-
    gated: the plane count derives from the corpus size
    (``derive_n_planes``, target bucket 64) in BOTH engines, so expected
    pair work stays ≈ N·target at any scale instead of a pinned plan's
    Σ|bucket|² → N²/2^planes drift.  Answers the pinned-plane caveat on
    ``llm_embedding_neardup``/``llm_knn_join``: the sizing logic itself is
    now value-checked (the oracle recomputes ceil(log2(N/target)) from its
    own COUNT), not only the fixed-plane projections of it."""
    e = parallelize_compute(load_table(spark, sf_dir, "embeddings"))
    from data_engineering_project_utn_spark.persist import track_persist

    e = track_persist(e)
    n_planes = sim.derive_n_planes(e.count(), target_bucket_size=64)
    pairs = sim.blocked_pairs(e, n_planes, ordered=True)
    return pairs.filter(F.col("cos_sim") >= 0.35).orderBy("id_a", "id_b")


# _QUALITY_CTES with text + token list carried through to the final q CTE,
# so downstream stages (dedup keeper, sharding, token totals) can reuse the
# same gated rows without recomputing the tokenizer.
_QUALITY_CTES_FULL = must_replace(
    must_replace(
        must_replace(
            _QUALITY_CTES,
            "tk AS (SELECT doc_id, lang, ",
            "tk AS (SELECT doc_id, lang, text, ",
        ),
        "m AS (SELECT doc_id, lang,",
        "m AS (SELECT doc_id, lang, text, t,",
    ),
    "q AS (SELECT doc_id, lang,",
    "q AS (SELECT doc_id, lang, text, t,",
)


@register(
    "llm_pipeline_manifest",
    oracle="WITH " + _QUALITY_CTES_FULL + """,
    g AS (SELECT doc_id, lang, text, t,
                 ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
          FROM q WHERE quality >= 0.4),
    k AS (SELECT doc_id, lang, t FROM g WHERE rn = 1),
    s AS (SELECT doc_id, lang, t,
                 CAST((ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1) % 4
                      AS INTEGER) AS shard
          FROM k)
    SELECT shard, COUNT(*) AS n_docs,
           CAST(SUM(len(t)) AS BIGINT) AS total_tokens,
           COUNT(DISTINCT lang) AS n_langs,
           MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
    FROM s GROUP BY shard ORDER BY shard
    """,
    tags=("llm", "curation", "pipeline"),
)
def llm_pipeline_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END curation pipeline in one gated plan — quality gate →
    exact dedup (min-doc_id keeper per content hash) → deterministic
    shuffle+shard (4 shards) → per-shard training manifest (docs, exact
    token totals, language spread, id range).  Every stage is a previously
    gated operator composed declaratively: Catalyst sees ONE plan, so
    column pruning and shared scans cross stage boundaries — the
    composition a user actually ships when they 'run the pipeline'.

    Scale shape: quality gate is narrow; dedup is one shuffle on the
    content hash; sharding is the distributed global rank (no
    single-partition stage); the manifest is a 4-row aggregate."""
    from pyspark.sql import Window as W

    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    passed = d.withColumn("quality", tx.quality_score(F.col("text"))).filter(
        F.col("quality") >= 0.4
    )
    rn = F.row_number().over(
        W.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")
    )
    kept = passed.withColumn("_rn", rn).filter(F.col("_rn") == 1).drop("_rn")
    sharded = sa.shard_assignment(kept, n_shards=4)
    n_tok = F.size(tx.tokens("text")).cast("long")
    return (
        sharded.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_tok).alias("total_tokens"),
            F.countDistinct("lang").alias("n_langs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("shard")
    )


@register(
    "llm_mixture_apply",
    oracle=rf"""
    WITH per AS (
        SELECT source, CAST(SUM(len({_TOKS})) AS BIGINT) AS tokens
        FROM documents GROUP BY source
    ),
    tot AS (SELECT SUM(tokens) AS total_tokens, COUNT(*) AS n_sources FROM per),
    wt AS (
        SELECT source,
               (1.0 / CAST(n_sources AS DOUBLE))
                   / (CAST(tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE)) AS weight
        FROM per, tot
    ),
    d AS (SELECT doc_id, source, CAST(len({_TOKS}) AS BIGINT) AS n_tok FROM documents),
    j AS (
        SELECT d.doc_id, d.source, d.n_tok, wt.weight,
               CAST(FLOOR(wt.weight) AS BIGINT)
               + CASE WHEN md5(CAST(d.doc_id AS VARCHAR)) <
                      printf('%08x', CAST(FLOOR((wt.weight - FLOOR(wt.weight))
                                                * 4294967296.0) AS BIGINT))
                      || repeat('0', 24)
                 THEN 1 ELSE 0 END AS n_copies
        FROM d JOIN wt USING (source)
    )
    SELECT source, MIN(weight) AS weight,
           COUNT(*) AS n_docs_kept,
           CAST(SUM(n_copies) AS BIGINT) AS n_rows_out,
           CAST(SUM(n_copies * n_tok) AS BIGINT) AS tokens_out
    FROM j WHERE n_copies > 0
    GROUP BY source ORDER BY source
    """,
    tags=("llm", "curation", "mixture"),
)
def llm_mixture_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture MATERIALIZATION (the step after llm_mixture_weights): each
    doc gets floor(weight) copies plus a deterministic hash-fraction extra,
    so up-weighted sources epoch-repeat and down-weighted sources thin —
    in expectation every source lands on its target token share.  Gated
    output is the per-source post-apply manifest (kept docs, emitted rows,
    emitted tokens).  Corpus side: one broadcast join + narrow arithmetic,
    no shuffle until the model-size summary."""
    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    ap = sa.apply_mixture(d)
    n_tok = F.size(tx.tokens("text")).cast("long")
    return (
        ap.groupBy("source")
        .agg(
            F.min("weight").alias("weight"),
            F.count(F.lit(1)).alias("n_docs_kept"),
            F.sum("n_copies").alias("n_rows_out"),
            F.sum(F.col("n_copies") * n_tok).alias("tokens_out"),
        )
        .orderBy("source")
    )


@register(
    "llm_knn_join_auto",
    oracle="WITH " + _sigs_cte_dynamic(256) + ",\n" + _capped_knn_tail(cap=256, k=5),
    tags=("llm", "similarity", "knnjoin", "auto"),
)
def llm_knn_join_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULLY AUTO k-NN join — derived plane count AND split cap, i.e.
    the exact configuration the 10x/2x scaling probes measure as the 100 TB
    path (BENCH_sf1.json: 1.97x per 2x rows) — now value-gated: the oracle
    recomputes ceil(log2(N/256)) from its own COUNT and replicates the
    split+reprobe arithmetic via the same SQL tail as the pinned capped
    query.  Nothing about the scale path is un-gated anymore: sizing,
    splitting, and reprobing all hash-match DuckDB at three SFs."""
    e = parallelize_compute(load_table(spark, sf_dir, "embeddings"))
    return sim.knn_join(e, k=5)


@register(
    "llm_embedding_dedup_clusters",
    oracle="WITH RECURSIVE " + _sigs_cte(4) + f""",
    cpairs AS (
        SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
        FROM sigs a JOIN sigs b
          ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE {_dot('a.embedding', 'b.embedding')}
              / (sqrt({_dot('a.embedding', 'a.embedding')})
                 * sqrt({_dot('b.embedding', 'b.embedding')})) >= 0.35
    ),
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM cpairs
              UNION SELECT doc_b, doc_a FROM cpairs),
    reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    )
    SELECT src AS doc_id, LEAST(src, MIN(dst)) AS keeper_doc
    FROM reach GROUP BY src ORDER BY doc_id
    """,
    tags=("llm", "dedup", "clusters", "similarity"),
)
def llm_embedding_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC dedup decision step: connected components over the
    embedding-cosine near-dup pairs (llm_embedding_neardup's blocking),
    each component keeping its min vec_id — the paraphrase-cluster twin of
    the lexical llm_dedup_clusters, sharing the same label-propagation
    operator and recursive-CTE oracle shape."""
    e = parallelize_compute(load_table(spark, sf_dir, "embeddings"))
    pairs = (
        sim.blocked_pairs(e, n_planes=4, ordered=True)
        .filter(F.col("cos_sim") >= 0.35)
        .select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    )
    return dd.dedup_clusters(pairs).orderBy("doc_id")


@register(
    "llm_ivf_auto",
    oracle="""
    SELECT COUNT(*) AS n_vectors,
           LEAST(65536, GREATEST(4, CAST(POW(2, CEIL(LOG2(SQRT(
               CAST(COUNT(*) AS DOUBLE))))) AS INTEGER))) AS k_derived,
           TRUE AS cells_bounded, TRUE AS objective_improved
    FROM embeddings
    """,
    tags=("llm", "similarity", "ivf", "auto"),
)
def llm_ivf_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUTO-SIZED IVF: the quantizer size derives from the corpus
    (k = 2^ceil(log2(√N)), the standard √N rule) in BOTH engines — the
    oracle value-checks the sizing from its own COUNT, completing the
    auto-path gating story (planes: llm_*_auto; split cap:
    llm_knn_join_auto; quantizer size: here).  Invariant gate on the
    actual training run (cells ≤ k, objective never worse than init),
    same as llm_ivf_trained."""
    from data_engineering_project_utn_spark.persist import track_persist

    e = track_persist(parallelize_compute(load_table(spark, sf_dir, "embeddings")))
    n = e.count()
    k = sim.derive_ivf_k(n)
    # train on a deterministic 25% sample — standard IVF practice (the
    # quantizer needs ~tens of points per centroid, not the corpus); the
    # sizing rule and n_vectors stay on the FULL corpus, which is what the
    # oracle value-checks.  Invariant booleans are audited on the sample.
    train_set = track_persist(e.filter(F.col("vec_id") % 4 == 0))
    init = sim.train_ivf_centroids(train_set, k=k, n_iter=0)
    trained = sim.train_ivf_centroids(train_set, k=k, n_iter=1, init=init)
    # packed report: at k=64 the literal path would bake 2×k×d ≈ 16k
    # literal doubles into one plan — analysis cost dwarfs execution
    _, cells_used, obj0, obj1 = sim.training_report(
        train_set, init, trained, max_literal_centroids=0
    )
    return spark.createDataFrame(
        [(n, k, 1 <= cells_used <= k, obj1 >= obj0 - 1e-12)],
        "n_vectors bigint, k_derived int, cells_bounded boolean, objective_improved boolean",
    )
