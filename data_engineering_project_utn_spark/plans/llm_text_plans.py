"""Text-analysis plan family (tokens, quality, langid, fingerprints,
PII, repetition, BPE, boilerplate, vocabulary)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_project_utn_spark.llm import text as tx
from data_engineering_project_utn_spark.llm.compute import parallelize_compute
# module-object import so the staleness closure includes llm_shared.py —
# the fragment names below are plain strings, which the closure BFS cannot
# follow on their own (plans/staleness.py walks modules and callables)
from data_engineering_project_utn_spark.plans import llm_shared as _llm_shared  # noqa: F401
from data_engineering_project_utn_spark.plans.llm_shared import (
    _QUALITY_CTES,
    _RARE_SHINGLE_CTES,
    _SH3,
    _SHINGLES,
    _SURPRISAL_CTES,
    _TOKS,
    _cm_bucket_sql,
    _plog2_sql,
)
from data_engineering_project_utn_spark.plans.registry import register
from data_engineering_project_utn_spark.tables import load_table

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


def _bpe_round(prev_seq_cte: str, top_cte: str, next_seq_cte: str | None) -> str:
    """One unrolled BPE round: pair-count argmax over the previous
    sequences, then (optionally) the merged sequences for the next round.
    Same pair construction and leftmost-non-overlapping ``replace`` as
    llm.text.train_bpe_merges."""
    sql = f"""{top_cte} AS (
        SELECT pair, CAST(SUM(cnt) AS BIGINT) AS n FROM (
            SELECT unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS pair, cnt
            FROM (SELECT string_split(trim(seq), ' ') AS tk, cnt FROM {prev_seq_cte})
        ) GROUP BY pair ORDER BY n DESC, pair LIMIT 1
    )"""
    if next_seq_cte:
        sql += f""",
    {next_seq_cte} AS (
        SELECT replace(seq, ' ' || (SELECT pair FROM {top_cte}) || ' ',
                       ' ' || replace((SELECT pair FROM {top_cte}), ' ', '') || ' ') AS seq, cnt
        FROM {prev_seq_cte}
    )"""
    return sql


@register(
    "llm_bpe_train",
    oracle=rf"""
    WITH w AS (
        SELECT w, COUNT(*) AS cnt
        FROM (SELECT unnest({_TOKS}) AS w FROM documents)
        WHERE w <> '' GROUP BY w
    ),
    s0 AS (SELECT ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS seq, cnt FROM w),
    {_bpe_round('s0', 't1', 's1')},
    {_bpe_round('s1', 't2', 's2')},
    {_bpe_round('s2', 't3', None)}
    SELECT 0 AS merge_idx, string_split(pair, ' ')[1] AS left_sym,
           string_split(pair, ' ')[2] AS right_sym, n AS pair_count FROM t1
    UNION ALL SELECT 1, string_split(pair, ' ')[1], string_split(pair, ' ')[2], n FROM t2
    UNION ALL SELECT 2, string_split(pair, ' ')[1], string_split(pair, ' ')[2], n FROM t3
    ORDER BY merge_idx
    """,
    tags=("llm", "text", "tokenizer", "iterative"),
)
def llm_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge TRAINING (tokenizer induction — the llm_bpe_tokens
    apply-step's upstream): three distributed merge rounds over the
    weighted vocabulary; the oracle unrolls the identical rounds in SQL
    (same pair fold, same argmax tie-break, same leftmost-non-overlapping
    replace), so an iterative training algorithm is value-gated end-to-end
    — the BPE analogue of the k-means-gated llm_ivf_trained, but bit-exact
    rather than invariant-checked.  Corpus text is scanned once (vocab
    groupBy); each round works on vocab-size data and collects one row."""
    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    merges = tx.train_bpe_merges(d, n_merges=3)
    return spark.createDataFrame(
        [(i, l, r, n) for i, l, r, n in merges],
        "merge_idx int, left_sym string, right_sym string, pair_count bigint",
    )


@register(
    "llm_bpe_compression",
    oracle=rf"""
    WITH w AS (
        SELECT w, COUNT(*) AS cnt
        FROM (SELECT unnest({_TOKS}) AS w FROM documents)
        WHERE w <> '' GROUP BY w
    ),
    s0 AS (SELECT ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS seq, cnt FROM w),
    {_bpe_round('s0', 't1', 's1')},
    {_bpe_round('s1', 't2', 's2')},
    {_bpe_round('s2', 't3', 's3')}
    , agg_b AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size,
               CAST(SUM(cnt * len(string_split(trim(seq), ' '))) AS BIGINT) AS symbols_before
        FROM s0
    ),
    agg_a AS (
        SELECT CAST(SUM(cnt * len(string_split(trim(seq), ' '))) AS BIGINT) AS symbols_after
        FROM s3
    )
    SELECT vocab_size, symbols_before, symbols_after,
           CAST(symbols_after AS DOUBLE) / CAST(symbols_before AS DOUBLE)
               AS compression_ratio
    FROM agg_b, agg_a
    """,
    tags=("llm", "text", "tokenizer"),
)
def llm_bpe_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the TRAINED merges back to the corpus vocabulary and measure
    the compression they buy: weighted symbol totals before vs after the
    three merges (train → apply composition; ``bpe_apply_merges`` uses the
    exact replace the trainer used, so the applied state equals the
    trainer's final state).  One corpus scan (vocab groupBy); the apply is
    three narrow projections over vocab-size data."""
    from data_engineering_project_utn_spark.persist import track_persist

    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    vocab = track_persist(tx.bpe_vocab_frame(d))
    merges = tx.train_bpe_merges(d, n_merges=3)
    after = tx.bpe_apply_merges(vocab, merges)
    n_sym = lambda c: F.size(F.split(F.trim(c), " ")).cast("long")  # noqa: E731
    joined = vocab.select(
        (F.col("cnt") * n_sym(F.col("seq"))).alias("_b"), "cnt"
    ).agg(
        F.count(F.lit(1)).alias("vocab_size"), F.sum("_b").alias("symbols_before")
    )
    after_agg = after.select((F.col("cnt") * n_sym(F.col("seq"))).alias("_a")).agg(
        F.sum("_a").alias("symbols_after")
    )
    return joined.crossJoin(F.broadcast(after_agg)).select(
        "vocab_size",
        "symbols_before",
        "symbols_after",
        (
            F.col("symbols_after").cast("double")
            / F.col("symbols_before").cast("double")
        ).alias("compression_ratio"),
    )


# (the count-min bucket oracle fragment _cm_bucket_sql moved to
# llm_shared.py — the span-dedup family's CM twin shares it now)


@register(
    "llm_cm_heavy_hitters",
    oracle=rf"""
    WITH tok AS (SELECT unnest({_TOKS}) AS token FROM documents),
    exact AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_cnt
              FROM tok GROUP BY token),
    top AS (SELECT token, exact_cnt FROM exact
            ORDER BY exact_cnt DESC, token LIMIT 20),
    cm AS (
        SELECT d, bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
            SELECT u.d AS d, {_cm_bucket_sql('token', 'u.d', 512)} AS bucket
            FROM tok, unnest([0, 1, 2]) u(d)
        ) GROUP BY d, bucket
    ),
    qh AS (
        SELECT t.token, t.exact_cnt, u.d AS d,
               {_cm_bucket_sql('t.token', 'u.d', 512)} AS bucket
        FROM top t, unnest([0, 1, 2]) u(d)
    )
    SELECT qh.token, qh.exact_cnt,
           CAST(MIN(cm.cnt) AS BIGINT) AS cm_estimate,
           CAST(MIN(cm.cnt) - qh.exact_cnt AS BIGINT) AS overestimate
    FROM qh JOIN cm USING (d, bucket)
    GROUP BY qh.token, qh.exact_cnt
    ORDER BY qh.exact_cnt DESC, qh.token
    """,
    tags=("llm", "text", "sketch"),
)
def llm_cm_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters — the documented petabyte-scale swap
    for exact frequency counts, made real AND bit-gated: the D·W counter
    sketch (a grouped aggregation whose map-side partial agg IS the sketch
    merge), point estimates for the top-20 true tokens, and the
    overestimate each suffers (≥ 0 by construction, the one-sided CM error
    bound visible in the gated output).  The oracle rebuilds the identical
    sketch from the same seeded md5 buckets."""
    from data_engineering_project_utn_spark.llm import sketch as sk
    from data_engineering_project_utn_spark.persist import track_persist

    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    tok = track_persist(d.select(F.explode(tx.tokens(F.col("text"))).alias("token")))
    exact = tok.groupBy("token").agg(F.count(F.lit(1)).alias("exact_cnt"))
    top = exact.orderBy(F.desc("exact_cnt"), "token").limit(20)
    counters = sk.cm_counters(tok, "token", depth=3, width=512)
    est = sk.cm_estimates(counters, top.select("token"), "token", depth=3, width=512)
    return (
        top.join(est, "token")
        .select(
            "token",
            "exact_cnt",
            "cm_estimate",
            (F.col("cm_estimate") - F.col("exact_cnt")).alias("overestimate"),
        )
        .orderBy(F.desc("exact_cnt"), "token")
    )


@register(
    "llm_cm_extract",
    oracle=rf"""
    WITH tok AS (SELECT unnest({_TOKS}) AS token FROM documents),
    cm AS (
        SELECT d, bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
            SELECT u.d AS d, {_cm_bucket_sql('token', 'u.d', 512)} AS bucket
            FROM tok, unnest([0, 1, 2]) u(d)
        ) GROUP BY d, bucket
    ),
    n AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total FROM cm WHERE d = 0),
    cand AS (SELECT DISTINCT token FROM tok),
    qh AS (
        SELECT c.token, u.d AS d,
               {_cm_bucket_sql('c.token', 'u.d', 512)} AS bucket
        FROM cand c, unnest([0, 1, 2]) u(d)
    ),
    est AS (
        SELECT qh.token, CAST(MIN(COALESCE(cm.cnt, 0)) AS BIGINT) AS cm_estimate
        FROM qh LEFT JOIN cm USING (d, bucket) GROUP BY qh.token
    ),
    exact AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_cnt
              FROM tok GROUP BY token)
    SELECT est.token, est.cm_estimate, exact.exact_cnt,
           CAST(n.n_total AS DOUBLE) / 256 AS threshold
    FROM est CROSS JOIN n JOIN exact ON est.token = exact.token
    WHERE CAST(est.cm_estimate AS DOUBLE) >= CAST(n.n_total AS DOUBLE) / 256
    ORDER BY est.cm_estimate DESC, est.token
    """,
    tags=("llm", "text", "sketch"),
)
def llm_cm_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min heavy-hitter EXTRACTION over a MERGED sketch — the
    shard-parallel shape: the corpus is split in two (doc_id parity), each
    half builds its own D·W sketch, ``cm_merge`` sums the counters, and
    ``cm_heavy_hitters`` keeps candidates whose estimate ≥ ε·N with N read
    from the merged sketch's row 0 (no second data pass) and ε = 1/256
    (exactly representable → cross-engine bit-parity).  The oracle builds
    ONE single-pass sketch over the whole corpus, so a green gate IS the
    mergeability proof: sketch(A) ⊎ sketch(B) ≡ sketch(A ∪ B), counter for
    counter.  At 100 TB: per-shard sketches are map-side partial aggs,
    the merge moves ≤ D·W rows per shard, candidates come from per-shard
    local top-k unions, and the extraction is one broadcast join —
    nothing here scales with corpus size except the narrow token scan."""
    from data_engineering_project_utn_spark.llm import sketch as sk
    from data_engineering_project_utn_spark.persist import track_persist

    d = parallelize_compute(load_table(spark, sf_dir, "documents"))

    def toks(frame: DataFrame) -> DataFrame:
        return frame.select(F.explode(tx.tokens(F.col("text"))).alias("token"))

    merged = sk.cm_merge(
        sk.cm_counters(toks(d.filter(F.col("doc_id") % 2 == 0)), "token"),
        sk.cm_counters(toks(d.filter(F.col("doc_id") % 2 == 1)), "token"),
    )
    all_tok = track_persist(toks(d))
    hitters = sk.cm_heavy_hitters(
        merged, all_tok.distinct(), "token", epsilon=1.0 / 256.0
    )
    exact = all_tok.groupBy("token").agg(F.count(F.lit(1)).alias("exact_cnt"))
    return (
        hitters.join(exact, "token")
        .select("token", "cm_estimate", "exact_cnt", "threshold")
        .orderBy(F.desc("cm_estimate"), "token")
    )


# HLL oracle fragments: the 2-hex-char bucket fold and the tail
# leading-zero rank, identical string ops to sketch.hll_registers.
# m = 256 (b=8): the two bucket hex chars ARE the register index, and the
# alpha literal is the repr of the exact Python float the Spark side
# folds, so both engines parse the identical double.
_HLL_M = 256
_HLL_ALPHA_LIT = repr(0.7213 / (1 + 1.079 / _HLL_M))
_HLL_BUCKET_SQL = (
    "list_reduce(list_transform(string_split(substring(md5(text), 1, 2), ''), "
    f"c -> strpos('0123456789abcdef', c) - 1), (a, x) -> a * 16 + x) % {_HLL_M}"
)
# every factor cast to DOUBLE: DuckDB parses bare numeric literals as
# DECIMAL and would fold this chain in (overflowing) decimal arithmetic,
# while Spark folds doubles — the casts make both engines run the same
# left-assoc IEEE chain on the same parsed doubles
_HLL_RAW_SQL = (
    f"CAST({_HLL_ALPHA_LIT} AS DOUBLE) * CAST(256 AS DOUBLE) * "
    "CAST(256 AS DOUBLE) * CAST(2305843009213693952 AS DOUBLE)"
    " / CAST(numerator AS DOUBLE)"
)


@register(
    "llm_hll_distinct",
    oracle=rf"""
    WITH hashed AS (
        SELECT {_HLL_BUCKET_SQL} AS bucket,
               regexp_replace(substring(md5(text), 3, 15), '^0+', '') AS stripped
        FROM documents
    ),
    rho AS (
        SELECT bucket,
               CASE WHEN length(stripped) = 0 THEN 61
                    ELSE (15 - length(stripped)) * 4 +
                         CASE substring(stripped, 1, 1)
                              WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
                              WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
                              WHEN '7' THEN 1 ELSE 0 END + 1
               END AS rho
        FROM hashed
    ),
    regs AS (SELECT bucket, MAX(rho) AS M FROM rho GROUP BY bucket),
    filled AS (SELECT COALESCE(r.M, 0) AS M FROM range(0, {_HLL_M}) g(bucket)
               LEFT JOIN regs r ON r.bucket = g.bucket),
    agg AS (SELECT SUM(CAST(CAST(1 AS BIGINT) << (61 - M) AS DECIMAL(38,0)))
                       AS numerator,
                   SUM(CASE WHEN M = 0 THEN 1 ELSE 0 END) AS n_empty
            FROM filled),
    est AS (
        SELECT CAST(ROUND(CASE WHEN {_HLL_RAW_SQL} <= 640.0 AND n_empty > 0
                               THEN 256.0 * ln(256.0 / CAST(n_empty AS DOUBLE))
                               ELSE {_HLL_RAW_SQL} END) AS BIGINT)
                   AS hll_estimate,
               CAST(n_empty AS BIGINT) AS n_empty_registers
        FROM agg
    ),
    ex AS (SELECT CAST(COUNT(DISTINCT text) AS BIGINT) AS exact_distinct
           FROM documents)
    SELECT ex.exact_distinct, est.hll_estimate, est.n_empty_registers,
           (CAST(est.hll_estimate AS DOUBLE) - CAST(ex.exact_distinct AS DOUBLE))
             / CAST(ex.exact_distinct AS DOUBLE) AS rel_error
    FROM est CROSS JOIN ex
    """,
    tags=("llm", "text", "sketch"),
)
def llm_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog distinct-count over MERGED per-shard
    sketches — the approx_count_distinct swap you can actually bit-gate:
    registers are md5-derived (bucket = 2 hex chars mod 64, ρ = tail
    leading-zero rank via string ops), the harmonic numerator accumulates
    exact BIGINT powers of two in decimal (order-independent, unlike
    library HLLs' float sums), and the corpus is split by doc_id parity
    with per-half register frames merged by max — the oracle builds ONE
    single-pass sketch, so a green gate proves hll(A) ⊔ hll(B) ≡
    hll(A ∪ B).  Output carries the exact distinct count and the relative
    error, so the sketch's accuracy (±~6.5 % at m=256) is visible in the
    gated result; at sf0.001 the estimate lands on the linear-counting
    branch (E ≤ 2.5m with empty registers), so both estimator regimes are
    cross-engine-gated.  At 100 TB: registers ≤ 256 rows per shard,
    map-side MAX partial agg IS the merge — the scan is the only term
    that scales."""
    from data_engineering_project_utn_spark.llm import sketch as sk

    d = load_table(spark, sf_dir, "documents")
    regs = sk.hll_merge(
        sk.hll_registers(d.filter(F.col("doc_id") % 2 == 0), "text", b=8),
        sk.hll_registers(d.filter(F.col("doc_id") % 2 == 1), "text", b=8),
    )
    est = sk.hll_estimate(regs, b=8)
    exact = d.agg(F.countDistinct("text").alias("exact_distinct"))
    return est.crossJoin(F.broadcast(exact)).select(
        "exact_distinct",
        "hll_estimate",
        "n_empty_registers",
        (
            (F.col("hll_estimate").cast("double") - F.col("exact_distinct").cast("double"))
            / F.col("exact_distinct").cast("double")
        ).alias("rel_error"),
    )


@register(
    "llm_tfidf_topk",
    priority=2,
    oracle=f"""
    WITH tk AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    tok AS (SELECT doc_id, unnest(t) AS term FROM tk),
    tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tok GROUP BY doc_id, term),
    df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS doc_freq
           FROM tf GROUP BY term),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS _n FROM documents),
    s AS (SELECT tf.doc_id, tf.term, tf.tf, df.doc_freq,
                 tf.tf * ((n._n * CAST(10000 AS BIGINT)) // df.doc_freq) AS score
          FROM tf JOIN df USING (term) CROSS JOIN n),
    r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY score DESC, term) AS rnk
          FROM s)
    SELECT doc_id, term, tf, doc_freq, CAST(score AS BIGINT) AS score,
           CAST(rnk AS BIGINT) AS rnk
    FROM r WHERE rnk <= 3
    ORDER BY score DESC, doc_id, term LIMIT 50
    """,
    tags=("llm", "text", "tfidf"),
)
def llm_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF signature terms: per-doc top-3 by score, globally ranked —
    the standard keyword/topic-signal layer of a corpus pipeline.  The idf
    is a fixed-point rational ⌊N·10⁴/df⌋ (monotone in N/df like ln, but
    exact BIGINT arithmetic → cross-engine bit-parity; see
    llm/text.py tfidf_frame for the two-shuffle scale shape)."""
    from pyspark.sql import Window

    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    scores = tx.tfidf_frame(d)
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scores.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .orderBy(F.desc("score"), "doc_id", "term")
        .limit(50)
    )


# Oracle fragment: Bloom bit position — first 8 md5 hex chars of
# "bf<seed>:<item>" folded to an int, mod the filter size (same char fold
# as the count-min bucket, distinct prefix to decorrelate the families).
def _bloom_bit_sql(item: str, seed: int, m: int) -> str:
    return (
        "list_reduce(list_transform(string_split(substring("
        f"md5('bf{seed}:' || {item}), 1, 8), ''), "
        "c -> strpos('0123456789abcdef', c) - 1), (a, x) -> a * 16 + x) "
        f"% {m}"
    )


@register(
    "llm_bloom_decontam",
    priority=2,
    oracle=f"""
    WITH tk AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id,
                  unnest(list_distinct(list_transform({_SH3}, s -> md5(s)))) AS h
           FROM tk),
    bench AS (SELECT DISTINCT h FROM sh WHERE doc_id % 97 = 0),
    bits AS (SELECT DISTINCT bit FROM (
        SELECT unnest([{_bloom_bit_sql('h', 0, 4096)},
                       {_bloom_bit_sql('h', 1, 4096)},
                       {_bloom_bit_sql('h', 2, 4096)}]) AS bit FROM bench)),
    corpus AS (SELECT DISTINCT doc_id, h FROM sh WHERE doc_id % 97 <> 0),
    probe AS (SELECT doc_id,
                     CASE WHEN {_bloom_bit_sql('h', 0, 4096)} IN (SELECT bit FROM bits)
                           AND {_bloom_bit_sql('h', 1, 4096)} IN (SELECT bit FROM bits)
                           AND {_bloom_bit_sql('h', 2, 4096)} IN (SELECT bit FROM bits)
                          THEN 1 ELSE 0 END AS bloom_hit,
                     CASE WHEN h IN (SELECT h FROM bench) THEN 1 ELSE 0 END AS exact_hit
              FROM corpus),
    flag AS (SELECT doc_id, MAX(bloom_hit) AS bloom_hit, MAX(exact_hit) AS exact_hit
             FROM probe GROUP BY doc_id)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_corpus_docs,
           CAST(SUM(bloom_hit) AS BIGINT) AS bloom_flagged,
           CAST(SUM(exact_hit) AS BIGINT) AS exact_flagged,
           CAST(SUM(CASE WHEN bloom_hit = 1 AND exact_hit = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS false_positive_docs,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS bits_set
    FROM flag
    """,
    tags=("llm", "text", "sketch", "decontamination"),
)
def llm_bloom_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination — the sketch-backed twin of
    ``llm_decontamination``: the benchmark's 3-gram shingle set compresses
    to a ≤ m-row bit frame (size independent of benchmark count — the
    structure you'd ship to every scan at 100 TB instead of the raw
    shingle strings), the corpus probes it via a broadcast left-join, and
    the gate reports bloom-flagged vs exact-flagged docs side by side —
    false_positive_docs ≥ 0 and NO false negatives is the one-sided Bloom
    contract, visible cross-engine bit-exactly.  Merge property
    (bits(A) ∪ bits(B) ≡ bits(A ∪ B)) is pytest-verified
    (tests/test_llm_sketch.py)."""
    from data_engineering_project_utn_spark.llm import sketch as sk
    from data_engineering_project_utn_spark.persist import track_persist

    M, K = 4096, 3
    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    sh = track_persist(
        d.select(
            "doc_id",
            F.explode(
                F.array_distinct(F.transform(tx.shingles("text", 3), F.md5))
            ).alias("h"),
        )
    )
    bench = sh.filter(F.col("doc_id") % 97 == 0).select("h").distinct()
    bits = track_persist(sk.bloom_bits(bench, "h", m=M, k=K))
    corpus = sh.filter(F.col("doc_id") % 97 != 0).distinct()
    probed = sk.bloom_contains(bits, corpus, "h", m=M, k=K)
    exact_ids = (
        corpus.join(F.broadcast(bench), "h", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("exact_hit", F.lit(1))
    )
    flag = (
        probed.groupBy("doc_id")
        .agg(F.max(F.col("maybe_present").cast("long")).alias("bloom_hit"))
        .join(F.broadcast(exact_ids), "doc_id", "left")
        .select("bloom_hit", F.coalesce("exact_hit", F.lit(0)).alias("exact_hit"))
    )
    n_bits = bits.agg(F.count(F.lit(1)).alias("bits_set"))
    return flag.agg(
        F.count(F.lit(1)).alias("n_corpus_docs"),
        F.sum("bloom_hit").alias("bloom_flagged"),
        F.sum("exact_hit").alias("exact_flagged"),
        F.sum(
            ((F.col("bloom_hit") == 1) & (F.col("exact_hit") == 0)).cast("long")
        ).alias("false_positive_docs"),
    ).crossJoin(F.broadcast(n_bits))


_HLL64_BUCKET_SQL = (
    "list_reduce(list_transform(string_split(substring(md5(text), 1, 2), ''), "
    "c -> strpos('0123456789abcdef', c) - 1), (a, x) -> a * 16 + x) % 64"
)
# m=64 raw-estimate chain, every factor DOUBLE-cast (same reason as
# _HLL_RAW_SQL: keep both engines in the identical IEEE fold)
_HLL64_RAW_SQL = (
    "CAST(0.709 AS DOUBLE) * CAST(64 AS DOUBLE) * CAST(64 AS DOUBLE) * "
    "CAST(2305843009213693952 AS DOUBLE) / CAST(numerator AS DOUBLE)"
)


@register(
    "llm_hll_by_source",
    priority=2,
    oracle=rf"""
    WITH hashed AS (
        SELECT source, {_HLL64_BUCKET_SQL} AS bucket,
               regexp_replace(substring(md5(text), 3, 15), '^0+', '') AS stripped
        FROM documents
    ),
    rho AS (
        SELECT source, bucket,
               CASE WHEN length(stripped) = 0 THEN 61
                    ELSE (15 - length(stripped)) * 4 +
                         CASE substring(stripped, 1, 1)
                              WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
                              WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
                              WHEN '7' THEN 1 ELSE 0 END + 1
               END AS rho
        FROM hashed
    ),
    regs AS (SELECT source, bucket, MAX(rho) AS M FROM rho GROUP BY source, bucket),
    filled AS (SELECT s.source, COALESCE(r.M, 0) AS M
               FROM (SELECT DISTINCT source FROM documents) s
               CROSS JOIN range(0, 64) g(bucket)
               LEFT JOIN regs r ON r.source = s.source AND r.bucket = g.bucket),
    agg AS (SELECT source,
                   SUM(CAST(CAST(1 AS BIGINT) << (61 - M) AS DECIMAL(38,0)))
                       AS numerator,
                   SUM(CASE WHEN M = 0 THEN 1 ELSE 0 END) AS n_empty
            FROM filled GROUP BY source),
    est AS (
        SELECT source,
               CAST(ROUND(CASE WHEN {_HLL64_RAW_SQL} <= 160.0 AND n_empty > 0
                               THEN 64.0 * ln(64.0 / CAST(n_empty AS DOUBLE))
                               ELSE {_HLL64_RAW_SQL} END) AS BIGINT)
                   AS hll_estimate,
               CAST(n_empty AS BIGINT) AS n_empty_registers
        FROM agg
    ),
    ex AS (SELECT source, CAST(COUNT(DISTINCT text) AS BIGINT) AS exact_distinct
           FROM documents GROUP BY source)
    SELECT est.source, ex.exact_distinct, est.hll_estimate, est.n_empty_registers
    FROM est JOIN ex USING (source)
    ORDER BY source
    """,
    tags=("llm", "text", "sketch"),
)
def llm_hll_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-GROUP HyperLogLog — distinct content per source in ONE scan,
    sketch state m·|sources| rows: the shape that profiles a 100 TB crawl
    by domain without |domain|×countDistinct passes.  Registers group on
    (source, bucket) (map-side MAX partial agg is still the merge), the
    register domain is completed per group, and both estimator branches
    run per group.  Exact per-source distincts ride along so the sketch
    error is visible in the gated output."""
    from data_engineering_project_utn_spark.llm import sketch as sk

    d = load_table(spark, sf_dir, "documents")
    regs = sk.hll_registers_grouped(d, "text", ["source"], b=6)
    est = sk.hll_estimate_grouped(regs, ["source"], b=6)
    exact = d.groupBy("source").agg(F.countDistinct("text").alias("exact_distinct"))
    return (
        est.join(exact, "source")
        .select("source", "exact_distinct", "hll_estimate", "n_empty_registers")
        .orderBy("source")
    )


@register(
    "llm_cm_by_source",
    priority=2,
    oracle=rf"""
    WITH tok AS (SELECT source, unnest({_TOKS}) AS token FROM documents),
    exact AS (SELECT source, token, CAST(COUNT(*) AS BIGINT) AS exact_cnt
              FROM tok GROUP BY source, token),
    top AS (SELECT source, token, exact_cnt FROM (
                SELECT source, token, exact_cnt,
                       row_number() OVER (PARTITION BY source
                                          ORDER BY exact_cnt DESC, token) AS rnk
                FROM exact) WHERE rnk <= 5),
    cm AS (
        SELECT source, d, bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
            SELECT source, u.d AS d, {_cm_bucket_sql('token', 'u.d', 512)} AS bucket
            FROM tok, unnest([0, 1, 2]) u(d)
        ) GROUP BY source, d, bucket
    ),
    qh AS (
        SELECT t.source, t.token, t.exact_cnt, u.d AS d,
               {_cm_bucket_sql('t.token', 'u.d', 512)} AS bucket
        FROM top t, unnest([0, 1, 2]) u(d)
    )
    SELECT qh.source, qh.token, qh.exact_cnt,
           CAST(MIN(COALESCE(cm.cnt, 0)) AS BIGINT) AS cm_estimate
    FROM qh LEFT JOIN cm USING (source, d, bucket)
    GROUP BY qh.source, qh.token, qh.exact_cnt
    ORDER BY qh.source, qh.exact_cnt DESC, qh.token
    """,
    tags=("llm", "text", "sketch"),
)
def llm_cm_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-GROUP count-min heavy hitters — token frequency profiling per
    source in ONE scan, sketch state depth·width rows per group (the
    grouped twin of ``llm_cm_heavy_hitters``, same seeded buckets): the
    top-5 true tokens per source with their within-group CM estimates.
    At 100 TB the per-(group, d, bucket) partial agg absorbs the token
    stream map-side exactly like the global sketch."""
    from pyspark.sql import Window
    from data_engineering_project_utn_spark.llm import sketch as sk
    from data_engineering_project_utn_spark.persist import track_persist

    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    tok = track_persist(
        d.select("source", F.explode(tx.tokens(F.col("text"))).alias("token"))
    )
    exact = tok.groupBy("source", "token").agg(
        F.count(F.lit(1)).alias("exact_cnt")
    )
    w = Window.partitionBy("source").orderBy(F.desc("exact_cnt"), "token")
    top = (
        exact.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .drop("rnk")
    )
    counters = sk.cm_counters_grouped(tok, "token", ["source"], depth=3, width=512)
    est = sk.cm_estimates_grouped(
        counters, top.select("source", "token"), "token", ["source"],
        depth=3, width=512,
    )
    return (
        top.join(est, ["source", "token"])
        .select("source", "token", "exact_cnt", "cm_estimate")
        .orderBy("source", F.desc("exact_cnt"), "token")
    )


@register(
    "llm_tfidf_cosine_pairs",
    priority=2,
    oracle=f"""
    WITH tk AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    {_RARE_SHINGLE_CTES},
    tok AS (SELECT doc_id AS did, unnest(t) AS term FROM tk),
    tf AS (SELECT did, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tok GROUP BY did, term),
    dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS doc_freq
            FROM tf GROUP BY term),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS _n FROM documents),
    w AS (SELECT did, term,
                 tf * LEAST((n._n * CAST(10000 AS BIGINT)) // doc_freq,
                            CAST(100000000 AS BIGINT)) AS w,
                 doc_freq
          FROM tf JOIN dfq USING (term) CROSS JOIN n),
    norms AS (SELECT did, SUM(CAST(w AS HUGEINT) * w) AS nn FROM w GROUP BY did),
    cand AS (SELECT id_a, id_b FROM candw),
    dots AS (SELECT c.id_a, c.id_b, SUM(CAST(wa.w AS HUGEINT) * wb.w) AS dot
             FROM cand c
             JOIN w wa ON wa.did = c.id_a
             JOIN w wb ON wb.did = c.id_b AND wb.term = wa.term
             GROUP BY c.id_a, c.id_b),
    res AS (SELECT d.id_a, d.id_b,
                   CAST(d.dot AS DOUBLE)
                   / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE)))
                       AS cosine
            FROM dots d
            JOIN norms na ON na.did = d.id_a
            JOIN norms nb ON nb.did = d.id_b)
    SELECT id_a, id_b, cosine FROM res WHERE cosine >= 0.5
    ORDER BY cosine DESC, id_a, id_b LIMIT 20
    """,
    tags=("llm", "text", "tfidf", "dedup"),
)
def llm_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF cosine near-dup pairs — the inverted-index lexical
    similarity join (see ``llm/text.py tfidf_cosine_pairs``): candidates
    blocked on rare 5-gram shingles (2 ≤ df ≤ 10 — the corpus vocabulary
    is tiny, so unigram blocking is vacuous, but shared word *sequences*
    mark genuine near-dups; pair space Σ_rare df², never corpus²),
    exact-integer sparse dots/norms over unigram TF-IDF weights, one
    floating divide at the end.  Third similarity axis next to
    MinHash-Jaccard and dense-embedding cosine; top-20 pairs.  Non-empty
    on the driver corpus at every SF (floor-asserted in
    tests/test_plans.py — VERDICT r06 #1)."""
    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    return (
        tx.tfidf_cosine_pairs(d, block_n=5)
        .orderBy(F.desc("cosine"), "id_a", "id_b")
        .limit(20)
    )


def _pagerank_oracle(iters: int = 3, scale: int = 10**6) -> str:
    """Unrolled fixed-point PageRank rounds over the rare-shingle document
    overlap graph (same blocking CTEs as the sparse-cosine gate)."""
    base = 3 * scale  # (20-17)·scale
    ctes = [
        f"tk AS (SELECT doc_id, {_TOKS} AS t FROM documents)",
        _RARE_SHINGLE_CTES,
        """edges AS (SELECT id_a AS src, id_b AS dst FROM candw
             UNION ALL SELECT id_b, id_a FROM candw)""",
        "deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src)",
        f"r0 AS (SELECT src AS node, CAST({scale} AS BIGINT) AS r FROM deg)",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"""c{t} AS (SELECT e.dst AS node, CAST(SUM(r.r // d.deg) AS BIGINT) AS m
             FROM edges e JOIN r{t-1} r ON r.node = e.src
             JOIN deg d ON d.src = e.src GROUP BY e.dst)"""
        )
        ctes.append(
            f"""r{t} AS (SELECT n.node,
                    CAST(({base} + 17 * COALESCE(c{t}.m, 0)) // 20 AS BIGINT) AS r
             FROM (SELECT src AS node FROM deg) n
             LEFT JOIN c{t} ON c{t}.node = n.node)"""
        )
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"\n    SELECT node AS doc_id, r AS rank_fp FROM r{iters}"
        " ORDER BY rank_fp DESC, node LIMIT 20"
    )


@register(
    "llm_pagerank",
    priority=2,
    oracle=_pagerank_oracle(),
    tags=("llm", "graph"),
)
def llm_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank over the rare-shingle document-overlap graph
    (``llm/graph.py``; edges = ``llm/text.rare_shingle_pairs``, the same
    blocking as the sparse-cosine gate — non-empty on the driver corpus,
    floor-asserted, VERDICT r06 #1) — hub documents by lexical-overlap
    centrality, the ranking complement to connected-components keeper
    selection.  Three unrolled synchronous rounds, exact integers
    end-to-end (17/20 damping, truncating division on non-negatives) —
    bit-gated against the chained CTE oracle.  Each round is one
    edges⨝ranks equi-join + grouped sum: the canonical distributed
    PageRank shape."""
    from data_engineering_project_utn_spark.llm import graph as gr
    from data_engineering_project_utn_spark.persist import track_persist

    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    cand = tx.rare_shingle_pairs(d, n=5, max_block_df=10).select("id_a", "id_b")
    edges = track_persist(gr.undirect(cand))
    return (
        gr.pagerank(edges, iters=3)
        .select(F.col("node").alias("doc_id"), "rank_fp")
        .orderBy(F.desc("rank_fp"), "doc_id")
        .limit(20)
    )


@register(
    "llm_quantile_sketch",
    priority=2,
    oracle="""
    WITH samp AS MATERIALIZED (
        SELECT doc_id, n_chars FROM (
            SELECT doc_id, n_chars, md5(CAST(doc_id AS VARCHAR)) AS h
            FROM documents ORDER BY h LIMIT 256)),
    kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM samp),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    sr AS (SELECT n_chars,
                  CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS r
           FROM samp),
    er AS (SELECT n_chars,
                  CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS r
           FROM documents),
    dd AS (SELECT CAST(unnest([1,2,3,4,5,6,7,8,9]) AS BIGINT) AS decile)
    SELECT dd.decile,
           se.n_chars AS est_value,
           ee.n_chars AS exact_value
    FROM dd CROSS JOIN kk CROSS JOIN nn
    JOIN sr se ON se.r = (dd.decile * kk.k + 9) // 10
    JOIN er ee ON ee.r = (dd.decile * nn.n + 9) // 10
    ORDER BY dd.decile
    """,
    tags=("llm", "text", "sketch"),
)
def llm_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch: doc-length deciles estimated from the
    deterministic bottom-k (KMV) sample next to the EXACT deciles — the
    rank-statistics member of the sketch family (count-min = frequency,
    HLL = cardinality, Bloom = membership, bottom-k = rank/quantile).
    The sample side is a TakeOrdered + a ≤ k-row window (bounded, like
    RunningTopK); the exact side uses the distributed ``with_global_rank``
    (no single-partition stage).  Sampling error is visible per decile in
    the gated output.  At 100 TB: per-shard bottom-k samples union and
    re-trim to the global sample (the merge identity, tested), so the
    sketch ships k rows per shard, then estimates any quantile without a
    global sort."""
    from pyspark.sql import Window

    from data_engineering_project_utn_spark.llm import sketch as sk
    from data_engineering_project_utn_spark.operators.histogram import (
        with_global_rank,
    )

    K = 256
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    samp = sk.bottomk_sample(d, "doc_id", K)
    kk = samp.agg(F.count(F.lit(1)).alias("k"))
    sr = samp.select(
        "n_chars",
        F.row_number()
        .over(Window.orderBy("n_chars", "doc_id"))
        .cast("long")
        .alias("r"),
    )
    exact = with_global_rank(d, ["n_chars", "doc_id"]).select(
        "n_chars", (F.col("_rank0") + 1).alias("r"), F.col("_total").alias("n")
    )
    deciles = spark.range(1, 10).select(F.col("id").cast("long").alias("decile"))
    est = (
        deciles.crossJoin(F.broadcast(kk))
        .join(sr, sr["r"] == F.expr("(decile * k + 9) div 10"))
        .select("decile", F.col("n_chars").alias("est_value"))
    )
    exa = (
        deciles.join(
            exact, exact["r"] == F.expr("(decile * n + 9) div 10")
        ).select("decile", F.col("n_chars").alias("exact_value"))
    )
    return est.join(exa, "decile").orderBy("decile")


def _wpagerank_oracle(iters: int = 3, scale: int = 10**6) -> str:
    """Unrolled weighted-PageRank rounds; edge weight = number of shared
    rare shingles (the natural strength of a lexical-overlap edge)."""
    base = 3 * scale
    ctes = [
        f"tk AS (SELECT doc_id, {_TOKS} AS t FROM documents)",
        _RARE_SHINGLE_CTES,
        """edges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst, w FROM candw
             UNION ALL SELECT id_b, id_a, w FROM candw)""",
        "wsum AS (SELECT src, CAST(SUM(w) AS BIGINT) AS sw FROM edges GROUP BY src)",
        f"r0 AS (SELECT src AS node, CAST({scale} AS BIGINT) AS r FROM wsum)",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"""c{t} AS MATERIALIZED (SELECT e.dst AS node,
                    CAST(SUM((r.r * e.w) // s.sw) AS BIGINT) AS m
             FROM edges e JOIN r{t-1} r ON r.node = e.src
             JOIN wsum s ON s.src = e.src GROUP BY e.dst)"""
        )
        ctes.append(
            f"""r{t} AS MATERIALIZED (SELECT n.node,
                    CAST(({base} + 17 * COALESCE(c{t}.m, 0)) // 20 AS BIGINT) AS r
             FROM (SELECT src AS node FROM wsum) n
             LEFT JOIN c{t} ON c{t}.node = n.node)"""
        )
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"\n    SELECT node AS doc_id, r AS rank_fp FROM r{iters}"
        " ORDER BY rank_fp DESC, node LIMIT 20"
    )


@register(
    "llm_pagerank_weighted",
    priority=2,
    oracle=_wpagerank_oracle(),
    tags=("llm", "graph"),
)
def llm_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the rare-shingle overlap graph: rank flows
    proportionally to HOW MANY rare shingles two docs share, not just
    whether they connect (``llm/graph.pagerank_weighted``; edges =
    ``llm/text.rare_shingle_pairs`` — non-empty on the driver corpus,
    floor-asserted, VERDICT r06 #1) — strongly overlapping hubs rise
    above incidental one-shingle neighbors.  Exact arithmetic end-to-end:
    the per-edge product r·w multiplies through DECIMAL(38,0) (matching
    the oracle's HUGEINT — no silent BIGINT wrap on hub-heavy graphs,
    ADVICE r06 #2); weight bound: shared-shingle counts ≤ doc length."""
    from data_engineering_project_utn_spark.llm import graph as gr
    from data_engineering_project_utn_spark.persist import track_persist

    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    wpairs = tx.rare_shingle_pairs(d, n=5, max_block_df=10)
    edges = track_persist(
        wpairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"), "w")
        .unionByName(
            wpairs.select(
                F.col("id_b").alias("src"), F.col("id_a").alias("dst"), "w"
            )
        )
    )
    return (
        gr.pagerank_weighted(edges, "w", iters=3)
        .select(F.col("node").alias("doc_id"), "rank_fp")
        .orderBy(F.desc("rank_fp"), "doc_id")
        .limit(20)
    )


@register(
    "llm_quantiles_by_source",
    priority=2,
    oracle="""
    WITH samp AS MATERIALIZED (
        SELECT source, doc_id, n_chars FROM (
            SELECT source, doc_id, n_chars,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY md5(CAST(doc_id AS VARCHAR))) AS hr
            FROM documents) WHERE hr <= 64),
    kk AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS k FROM samp GROUP BY source),
    nn AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY source),
    sr AS (SELECT source, n_chars,
                  CAST(row_number() OVER (PARTITION BY source
                                          ORDER BY n_chars, doc_id) AS BIGINT) AS r
           FROM samp),
    er AS (SELECT source, n_chars,
                  CAST(row_number() OVER (PARTITION BY source
                                          ORDER BY n_chars, doc_id) AS BIGINT) AS r
           FROM documents),
    qq AS (SELECT CAST(unnest([1, 2, 3]) AS BIGINT) AS quartile)
    SELECT kk.source, qq.quartile,
           se.n_chars AS est_value,
           ee.n_chars AS exact_value
    FROM kk CROSS JOIN qq
    JOIN nn ON nn.source = kk.source
    JOIN sr se ON se.source = kk.source AND se.r = (qq.quartile * kk.k + 3) // 4
    JOIN er ee ON ee.source = kk.source AND ee.r = (qq.quartile * nn.n + 3) // 4
    ORDER BY kk.source, qq.quartile
    """,
    tags=("llm", "text", "sketch"),
)
def llm_quantiles_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-GROUP quantile sketch: doc-length quartiles per source from the
    grouped bottom-k sample next to the exact per-group quartiles — the
    grouped member completing the sketch family (grouped CM = frequency,
    grouped HLL = cardinality, grouped bottom-k = rank).  One scan, ≤ k
    sample rows per group; every rank formula is exact integer ceiling
    division, identical cross-engine."""
    from pyspark.sql import Window

    from data_engineering_project_utn_spark.llm import sketch as sk

    K = 64
    d = load_table(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    samp = sk.bottomk_sample_grouped(d, "doc_id", ["source"], K)
    kk = samp.groupBy("source").agg(F.count(F.lit(1)).alias("k"))
    nn = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    sw = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    sr = samp.select(
        "source", "n_chars", F.row_number().over(sw).cast("long").alias("r")
    )
    er = d.select(
        "source", "n_chars", F.row_number().over(sw).cast("long").alias("r")
    )
    quartiles = spark.range(1, 4).select(F.col("id").cast("long").alias("quartile"))
    est = (
        kk.crossJoin(quartiles)
        .join(
            sr,
            (sr["source"] == kk["source"])
            & (sr["r"] == F.expr("(quartile * k + 3) div 4")),
        )
        .select(kk["source"], "quartile", F.col("n_chars").alias("est_value"))
    )
    exa = (
        nn.crossJoin(quartiles.alias("q2"))
        .join(
            er,
            (er["source"] == nn["source"])
            & (er["r"] == F.expr("(quartile * n + 3) div 4")),
        )
        .select(nn["source"], "quartile", F.col("n_chars").alias("exact_value"))
    )
    return est.join(exa, ["source", "quartile"]).orderBy("source", "quartile")


# Shared by the id-oriented gate and its degree-ordered twin: the
# triangle SET is orientation-independent, so one oracle holds both
# plans to the same bits.
_TRIANGLE_ORACLE = f"""
    WITH tk AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    {_RARE_SHINGLE_CTES},
    e AS (SELECT DISTINCT id_a AS a, id_b AS b FROM candw),
    tris AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
             FROM e e1 JOIN e e2 ON e1.b = e2.a
             JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
    pern AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS tri FROM (
                 SELECT x AS node FROM tris
                 UNION ALL SELECT y FROM tris
                 UNION ALL SELECT z FROM tris) GROUP BY node),
    deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
                SELECT a AS node FROM e UNION ALL SELECT b FROM e)
            GROUP BY node)
    SELECT d.node AS doc_id, COALESCE(p.tri, 0) AS tri, d.deg,
           CAST(COALESCE(p.tri, 0) * 2 AS BIGINT) AS cc_num,
           CAST(d.deg * (d.deg - 1) AS BIGINT) AS cc_den
    FROM deg d LEFT JOIN pern p USING (node)
    ORDER BY tri DESC, deg DESC, doc_id LIMIT 20
    """


@register(
    "llm_graph_triangles",
    priority=2,
    oracle=_TRIANGLE_ORACLE,
    tags=("llm", "graph"),
)
def llm_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counts + exact-rational local clustering coefficients
    over the rare-shingle document-overlap graph
    (``llm/graph.triangle_counts``; edges = the same
    ``rare_shingle_pairs`` blocking as the PageRank/sparse-cosine gates,
    so the whole graph family shares one edge definition).  Triangles
    mark tight mutual near-dup cliques that pairwise similarity scores
    can't see; cc stays an integer pair (2·tri, deg·(deg−1)) so the gate
    is division-free.  Canonical-orientation enumeration (x<y<z found
    exactly once as two wedge joins + one closing pair join — never an
    all-pairs product); ≥ 1 triangle exists on the driver corpus at
    every SF (any rare shingle with df ≥ 3 closes one), floor-asserted."""
    from data_engineering_project_utn_spark.llm import graph as gr
    from data_engineering_project_utn_spark.persist import track_persist

    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    edges = track_persist(tx.rare_shingle_pairs(d).select("id_a", "id_b"))
    return (
        gr.triangle_counts(edges)
        .select(F.col("node").alias("doc_id"), "tri", "deg", "cc_num", "cc_den")
        .orderBy(F.desc("tri"), F.desc("deg"), "doc_id")
        .limit(20)
    )


@register(
    "llm_graph_triangles_degree",
    priority=2,
    oracle=_TRIANGLE_ORACLE,
    tags=("llm", "graph"),
)
def llm_graph_triangles_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-ordered twin of ``llm_graph_triangles`` (VERDICT r07 #5):
    the same triangle/cc output held to the SAME oracle, enumerated on
    the (degree, id) orientation (``llm/graph.
    triangle_counts_degree_ordered``) — the hub-skew fix SCALE.md's
    argument names for 100 TB, now as code under a bit gate.  On a
    power-law overlap graph the wedge fan-out follows LOW-degree
    endpoints (max out-degree O(√|E|)) instead of whichever hub happens
    to hold a low id; a planted-hub test asserts the out-degree bound
    drops (tests/test_llm_ops.py::TestTriangleOrientation)."""
    from data_engineering_project_utn_spark.llm import graph as gr
    from data_engineering_project_utn_spark.persist import track_persist

    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    edges = track_persist(tx.rare_shingle_pairs(d).select("id_a", "id_b"))
    return (
        gr.triangle_counts_degree_ordered(edges)
        .select(F.col("node").alias("doc_id"), "tri", "deg", "cc_num", "cc_den")
        .orderBy(F.desc("tri"), F.desc("deg"), "doc_id")
        .limit(20)
    )


@register(
    "llm_bm25_topk",
    priority=2,
    oracle=f"""
    WITH tok AS (SELECT doc_id AS did, unnest({_TOKS}) AS term FROM documents),
    tf AS (SELECT did, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tok GROUP BY did, term),
    dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS doc_freq
            FROM tf GROUP BY term),
    lens AS (SELECT did, CAST(COUNT(*) AS BIGINT) AS len FROM tok GROUP BY did),
    nal AS (SELECT CAST(COUNT(*) AS BIGINT) AS _n,
                   CAST(SUM(len) AS BIGINT) AS _al FROM lens),
    qt AS (SELECT DISTINCT term FROM tok WHERE did = 0),
    c AS (SELECT tf.did,
                 (CAST((2 * nal._n - 2 * dfq.doc_freq + 1) * 10000
                       // (2 * dfq.doc_freq + 1) AS HUGEINT)
                  * (88 * nal._al * tf.tf))
                 // (40 * nal._al * tf.tf + 12 * nal._al
                     + 36 * lens.len * nal._n) AS c
          FROM tf JOIN qt USING (term) JOIN dfq USING (term)
          JOIN lens ON lens.did = tf.did CROSS JOIN nal)
    SELECT did AS doc_id, CAST(SUM(c) AS BIGINT) AS score_fp
    FROM c WHERE did <> 0
    GROUP BY did ORDER BY score_fp DESC, doc_id LIMIT 10
    """,
    tags=("llm", "text", "retrieval"),
)
def llm_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point BM25 retrieval, query-by-example
    (``llm/text.bm25_scores``): score every document against the distinct
    tokens of doc 0 (the "more like this" probe — a deterministic,
    corpus-derived query vocabulary) and return the top-10 other docs.
    k1 = 1.2 and b = 0.75 enter as the rationals 12/10 and 3/4, idf is
    the rational Robertson ratio at fixed point, and every per-term
    contribution clears its fractions into ONE integer division — the
    classic tf-saturating, length-normalized relevance ranking with zero
    floating arithmetic, bit-gated cross-engine.  The query-term probe
    is a broadcast semi-join; N and avg-length are 1-row broadcasts."""
    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    qt = d.filter(F.col("doc_id") == 0).select(
        F.explode(tx.tokens(F.col("text"))).alias("term")
    )
    return (
        tx.bm25_scores(d, qt)
        .filter(F.col("doc_id") != 0)
        .select("doc_id", F.col("score_fp").cast("long").alias("score_fp"))
        .orderBy(F.desc("score_fp"), "doc_id")
        .limit(10)
    )


@register(
    "llm_bigram_surprisal",
    priority=2,
    oracle=f"""
    WITH {_SURPRISAL_CTES}
    SELECT doc_id, bits_fp, n_bigrams,
           CAST(bits_fp AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS bits_per_bigram
    FROM agg
    ORDER BY bits_per_bigram DESC, doc_id LIMIT 20
    """,
    tags=("llm", "text", "quality"),
)
def llm_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity filtering, bit-exact: per-document
    surprisal under an add-one-smoothed corpus bigram LM
    (``llm/text.bigram_surprisal``), with −log₂ p̂ quantized to integer
    bit lengths (floor-log₂ via ``bin``/``format('{{:b}}')`` — both
    engines compute the identical integer, no transcendental anywhere).
    Top-20 most-surprising documents by exact-rational bits-per-bigram —
    the LM-based quality axis next to the heuristic quality score
    (stopword/length ratios) and the repetition detector.  The LM stays
    distributed (state = distinct bigrams); only the vocab size V is
    broadcast."""
    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    s = tx.bigram_surprisal(d)
    return (
        s.select(
            "doc_id",
            "bits_fp",
            "n_bigrams",
            (F.col("bits_fp").cast("double") / F.col("n_bigrams").cast("double")).alias(
                "bits_per_bigram"
            ),
        )
        .orderBy(F.desc("bits_per_bigram"), "doc_id")
        .limit(20)
    )


@register(
    "llm_winnowing",
    priority=2,
    oracle=f"""
    WITH tk AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    shp AS (SELECT doc_id AS did, CAST(greatest(len(t) - 4, 1) AS BIGINT) AS cnt,
                   unnest(list_transform({_SHINGLES}, s -> md5(s))) AS h,
                   unnest(list_transform(range(1, greatest(len(t) - 4, 1) + 1),
                                         i -> CAST(i AS BIGINT))) AS pos
            FROM tk),
    sel AS (SELECT did, cnt, pos,
                   min(struct_pack(h := h, pos := pos))
                       OVER (PARTITION BY did ORDER BY pos
                             ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m
            FROM shp),
    fps AS (SELECT DISTINCT did, m.h AS fp, CAST(m.pos AS BIGINT) AS fp_pos
            FROM sel WHERE pos <= cnt - 4 + 1),
    fdf AS (SELECT fp, CAST(COUNT(DISTINCT did) AS BIGINT) AS fdf FROM fps GROUP BY fp),
    pf AS (SELECT f.did, f.fp FROM (SELECT DISTINCT did, fp FROM fps) f
           JOIN fdf USING (fp) WHERE fdf BETWEEN 2 AND 10)
    SELECT a.did AS id_a, b.did AS id_b, CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM pf a JOIN pf b ON a.fp = b.fp AND a.did < b.did
    GROUP BY a.did, b.did
    ORDER BY n_shared DESC, id_a, id_b LIMIT 20
    """,
    tags=("llm", "text", "dedup", "fingerprint"),
)
def llm_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed fingerprint index → overlap pairs
    (``llm/text.winnow_fingerprints``, MOSS): window-of-4 minima over
    positional 5-gram digests give a ~2/(w+1)-density fingerprint set
    per doc with the winnowing guarantee (any shared run of ≥ w+n−1
    tokens shares ≥ 1 fingerprint); pairs then come from the SMALL
    winnowed inverted index (df-capped 2..10, the family's blocking
    hygiene) instead of the full shingle index — the practical
    plagiarism-index shape.  Top-20 pairs by shared-fingerprint count;
    exact integers throughout."""
    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    from data_engineering_project_utn_spark.persist import track_persist

    fps = track_persist(tx.winnow_fingerprints(d, w=4, n=5).select("doc_id", "fp").distinct())
    fdf = fps.groupBy("fp").agg(F.countDistinct("doc_id").alias("fdf"))
    pf = fps.join(
        fdf.filter((F.col("fdf") >= 2) & (F.col("fdf") <= 10)), "fp"
    ).select(F.col("doc_id").alias("did"), "fp")
    return (
        pf.alias("a")
        .join(pf.alias("b"), "fp")
        .filter(F.col("a.did") < F.col("b.did"))
        .groupBy(F.col("a.did").alias("id_a"), F.col("b.did").alias("id_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .orderBy(F.desc("n_shared"), "id_a", "id_b")
        .limit(20)
    )


@register(
    "llm_token_pairs",
    priority=2,
    oracle=f"""
    WITH tk AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    dt AS (SELECT doc_id, unnest(list_distinct(t)) AS tok FROM tk),
    df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM dt GROUP BY tok),
    freq AS (SELECT dt.doc_id, dt.tok FROM dt JOIN df USING (tok) WHERE df.df >= 20),
    pairs AS (SELECT a.tok AS tok_a, b.tok AS tok_b, CAST(COUNT(*) AS BIGINT) AS support
              FROM freq a JOIN freq b
                ON a.doc_id = b.doc_id AND a.tok < b.tok
              GROUP BY a.tok, b.tok
              HAVING COUNT(*) >= 20)
    SELECT tok_a, tok_b, support FROM pairs
    ORDER BY support DESC, tok_a, tok_b LIMIT 20
    """,
    tags=("llm", "text", "itemsets"),
)
def llm_token_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent token-pair mining (the 2-itemset core of
    FP-growth/apriori — co-occurrence statistics for vocabulary
    analysis and collocation detection): pairs of distinct tokens
    co-occurring in ≥ 20 documents, with the APRIORI prune applied
    first — only tokens whose own document frequency meets the support
    floor ever enter the pair join (a pair can't be frequent if either
    member isn't), so pair space is Σ over frequent tokens only, the
    classic candidate-generation bound.  Top-20 by support with a total
    order."""
    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    dt = d.select(
        "doc_id", F.explode(F.array_distinct(tx.tokens(F.col("text")))).alias("tok")
    )
    from data_engineering_project_utn_spark.persist import track_persist

    dt = track_persist(dt)
    df_frame = dt.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    freq = dt.join(
        F.broadcast(df_frame.filter(F.col("df") >= 20).select("tok")), "tok"
    )
    fa = freq.select("doc_id", F.col("tok").alias("tok_a"))
    fb = freq.select("doc_id", F.col("tok").alias("tok_b"))
    return (
        fa.join(fb, "doc_id")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .filter(F.col("support") >= 20)
        .orderBy(F.desc("support"), "tok_a", "tok_b")
        .limit(20)
    )


@register(
    "llm_zipf_slope",
    priority=2,
    oracle=f"""
    WITH tok AS (SELECT unnest({_TOKS}) AS tok FROM documents),
    freq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS f FROM tok GROUP BY tok),
    top AS (SELECT tok, f FROM freq ORDER BY f DESC, tok LIMIT 1000),
    pts AS (SELECT CAST({{PLOG_R}} AS BIGINT) AS x, CAST({{PLOG_F}} AS BIGINT) AS y
            FROM (SELECT f, row_number() OVER (ORDER BY f DESC, tok) AS r FROM top)),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CAST(x AS HUGEINT)) AS BIGINT) AS sx,
                 CAST(SUM(CAST(y AS HUGEINT)) AS BIGINT) AS sy,
                 SUM(CAST(x AS HUGEINT) * y) AS sxy,
                 SUM(CAST(x AS HUGEINT) * x) AS sxx
          FROM pts)
    SELECT n, sx, sy,
           CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
           / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS zipf_slope
    FROM s
    """.replace("{PLOG_R}", _plog2_sql("r")).replace("{PLOG_F}", _plog2_sql("f")),
    tags=("llm", "text", "report"),
)
def llm_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law exponent of the corpus vocabulary — the log-log
    rank-frequency slope (healthy natural text ≈ −1; a flat slope
    flags templated/synthetic text, a cliff flags boilerplate): least
    squares over (plog2(rank), plog2(freq)) for the top-1000 tokens,
    with EVERY moment an exact integer (the piecewise-linear
    fixed-point log₂, decimal-safe sums) and ONE floating division at
    the end — regression as a bit-gateable artifact.  The rank window
    runs over the top-1000 frame only (model-size by construction —
    TakeOrdered bounds it before any ranking), so no vocabulary-sized
    sort ever plans."""
    from data_engineering_project_utn_spark.functions.scalar import plog2_sql
    from pyspark.sql import Window

    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    freq = (
        d.select(F.explode(tx.tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    top = freq.orderBy(F.desc("f"), "tok").limit(1000)
    ranked = top.withColumn(
        "r", F.row_number().over(Window.orderBy(F.desc("f"), "tok")).cast("long")
    )
    pts = ranked.select(
        F.expr(plog2_sql("r")).cast("long").alias("x"),
        F.expr(plog2_sql("f")).cast("long").alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
    )
    return s.select(
        "n",
        "sx",
        "sy",
        (
            (F.col("n") * F.col("sxy") - F.col("sx").cast("decimal(38,0)") * F.col("sy")).cast(
                "double"
            )
            / (
                F.col("n") * F.col("sxx")
                - F.col("sx").cast("decimal(38,0)") * F.col("sx")
            ).cast("double")
        ).alias("zipf_slope"),
    )


@register(
    "llm_ngram_novelty",
    priority=2,
    oracle=f"""
    WITH tk AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id, unnest(list_distinct({_SHINGLES})) AS g FROM tk),
    gdf AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS gdf FROM sh GROUP BY g),
    per AS (SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_shingles,
                   CAST(SUM(CASE WHEN gdf = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_novel
            FROM sh JOIN gdf USING (g) GROUP BY doc_id)
    SELECT doc_id, n_shingles, n_novel,
           CAST(n_novel * 1000000 // n_shingles AS BIGINT) AS novelty_ppm
    FROM per
    ORDER BY novelty_ppm DESC, doc_id LIMIT 20
    """,
    tags=("llm", "text", "quality", "dedup"),
)
def llm_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram NOVELTY — the fraction of a doc's distinct
    5-gram shingles that occur NOWHERE else in the corpus (df = 1), as
    a fixed-point ppm.  The inverse signal of the dup/contamination
    family: span dedup finds what repeats, this scores what doesn't —
    the memorization/boilerplate axis (high novelty = unique content
    worth keeping; near-zero novelty = templated or duplicated text
    even when no single pair crosses a dedup threshold).  Top-20 most
    novel documents, exact integer ratio (novel·10⁶ div shingles).

    Scale: one distinct-shingle explode + one df groupBy (map-side
    combined, vocabulary-keyed) + one doc-key re-aggregation — the
    TF-IDF frame's shuffle shape; no pair space at all."""
    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    sh = d.select(
        "doc_id", F.explode(F.array_distinct(tx.shingles("text"))).alias("g")
    )
    from data_engineering_project_utn_spark.persist import track_persist

    sh = track_persist(sh)
    gdf = sh.groupBy("g").agg(F.count(F.lit(1)).alias("gdf"))
    per = (
        sh.join(gdf, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(F.when(F.col("gdf") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
        )
    )
    return (
        per.select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.expr("n_novel * 1000000 div n_shingles").cast("long").alias("novelty_ppm"),
        )
        .orderBy(F.desc("novelty_ppm"), "doc_id")
        .limit(20)
    )


@register(
    "llm_collocation_pmi",
    oracle=f"""
    WITH tk AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    pos AS (SELECT t, unnest(range(1, len(t) + 1)) AS i FROM tk),
    pr AS (SELECT t[i] AS a, t[i + g.g] AS b
           FROM pos, range(1, 4) g(g) WHERE i + g.g <= len(t)),
    cab AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS support
            FROM pr GROUP BY a, b),
    ca AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS ca FROM pr GROUP BY a),
    cb AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cb FROM pr GROUP BY b),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS p FROM pr)
    SELECT cab.a AS tok_a, cab.b AS tok_b, support,
           CAST({_plog2_sql('support')} + {_plog2_sql('tot.p')}
                - {_plog2_sql('ca.ca')} - {_plog2_sql('cb.cb')} AS BIGINT)
               AS pmi_fp
    FROM cab JOIN ca USING (a) JOIN cb USING (b), tot
    WHERE support >= 5
    ORDER BY pmi_fp DESC, tok_a, tok_b LIMIT 20
    """,
    tags=("llm", "text", "collocation"),
)
def llm_collocation_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed-PMI collocation extraction (Church & Hanks): ordered token
    pairs within 3 positions, scored plog2(c_ab) + plog2(P) − plog2(c_a→)
    − plog2(→c_b) on the shared fixed-point integer log₂ — the
    POSITIONAL counterpart of the document-level 2-itemset gate
    (order/distance-blind support vs adjacency-demanding collocations).
    Support ≥ 5 keeps maximal-PMI hapax pairs out; top-20 under a total
    order.  Pairs build narrow per row (no positional self-join); only
    count aggregates shuffle.
    """
    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    return tx.collocation_pmi(d, window=3, min_support=5, topk=20)
