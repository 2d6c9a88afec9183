"""Text analysis for training-data pipelines — token stats, quality scoring,
language ID, fingerprinting.

All pure Column expressions (JVM codegen, zero Python in the hot path), so a
100 TB document corpus is processed at scan speed with no shuffle: every op
here is a narrow per-row projection.  Aggregation layers on top shuffle once
on their group key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword langid heuristic.
STOPWORDS = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "de": ("der", "die", "das", "und", "ist", "von", "ein", "zu"),
    "fr": ("le", "la", "de", "et", "un", "est", "que", "en"),
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (lowercased, empty tokens dropped).

    The filter is load-bearing: ``F.split`` keeps the empty string produced
    by leading/trailing whitespace (``split(' b') == ['', 'b']``) and
    ``split('') == ['']``, so without it ``token_count(' b')`` would be 2
    and ``token_count('')`` would be 1 — a phantom token that pollutes
    vocab tops, BM25 length normalization, and span positions on
    whitespace-dirty corpora.  Contract: ``token_count(' b') == 1``,
    ``token_count('') == 0``, all-whitespace text → empty array.  The
    DuckDB oracle twin (``plans/llm_shared._TOKS``) applies the same
    filter — keep the two in lockstep.
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != F.lit(""))


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("long")


def distinct_token_count(text: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(text))).cast("long")


def stopword_count(text: Column | str, lang: str = "en") -> Column:
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(words, t))).cast(
        "long"
    )


def quality_score(text: Column | str) -> Column:
    """Composite quality in [0,1]: length saturation + stopword share +
    lexical diversity.  Mirrors the length/punct/stopword-ratio scoring used
    in large-scale corpus filtering (e.g. C4/Gopher rules), restricted to
    deterministic integer-derived arithmetic so oracles hash-match."""
    n = token_count(text).cast("double")
    stop_ratio = stopword_count(text).cast("double") / n
    uniq_ratio = distinct_token_count(text).cast("double") / n
    length_sat = F.least(n / F.lit(100.0), F.lit(1.0))
    return (
        F.lit(0.4) * length_sat + F.lit(0.3) * stop_ratio + F.lit(0.3) * uniq_ratio
    )


def langid_scores(text: Column | str) -> dict[str, Column]:
    """Stopword-hit count per candidate language."""
    return {lang: stopword_count(text, lang) for lang in STOPWORDS}


def predicted_lang(text: Column | str) -> Column:
    """argmax over language stopword hits; 'und' (undetermined) when all 0.

    Deterministic tie-break: earlier language in (en, es, de, fr) wins —
    a strictly-greater fold, reproducible as a nested CASE in SQL.
    """
    scores = langid_scores(text)
    best_lang = F.lit("und")
    best_score = F.lit(0).cast("long")
    for lang in ("en", "es", "de", "fr"):
        s = scores[lang]
        wins = s > best_score
        best_lang = F.when(wins, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(wins, s).otherwise(best_score)
    return best_lang


def shingles(text: Column | str, n: int = 5) -> Column:
    """n-gram (word) shingles: array of space-joined n-token windows.
    Docs shorter than n tokens yield a single shingle of the whole doc."""
    toks = tokens(text)
    k = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(k - F.lit(n - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))


def rolling_fingerprint(text: Column | str, n: int = 5) -> Column:
    """Document fingerprint = lexicographic min of md5(shingle) — a 1-perm
    MinHash over rolling n-gram windows (content-defined, order-sensitive)."""
    return F.array_min(F.transform(shingles(text, n), F.md5))


def frequent_ngrams(
    docs: DataFrame,
    n: int = 3,
    min_df: int = 5,
    limit: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-frequent word n-grams — boilerplate candidates (the cross-
    document repetition signal CCNet/RefinedWeb-style cleaning removes;
    the reference has no corpus-level text analysis at all).

    ``df`` counts *documents* containing the n-gram (shingles deduped
    per-doc before the explode), so a single spammy document cannot
    promote its own repetition into "boilerplate".  Output is bounded by
    construction — ``min_df`` floor, then top-``limit`` on the total
    order (df desc, ngram) — so downstream consumers may broadcast it.

    Scale: explode + groupBy(ngram) partial-aggregates map-side; the
    top-limit is a TakeOrdered, never a global sort.  At 100 TB swap the
    exact df count for a count-min/heavy-hitter sketch per partition and
    merge — the bounded-output contract is unchanged.
    """
    sh = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("ngram"),
    )
    counts = sh.groupBy("ngram").agg(F.count(F.lit(1)).alias("df"))
    return (
        counts.filter(F.col("df") >= min_df)
        .orderBy(F.desc("df"), "ngram")
        .limit(limit)
    )


def boilerplate_ratio(
    docs: DataFrame,
    n: int = 3,
    min_df: int = 5,
    limit: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document boilerplate share: the fraction of a doc's distinct
    n-grams that are corpus-frequent (``frequent_ngrams``) — the doc-level
    filter stage built on the corpus-level signal.

    The frequent list is bounded (≤ ``limit`` rows) so it broadcasts; the
    corpus side is one explode + two aggregations on the same shuffle key
    (``id_col``) — no corpus-vs-corpus join at any scale.
    """
    from data_engineering_project_utn_spark.persist import track_persist

    # one persisted shingle explode feeds the df count, the per-doc
    # denominator, and the hit join — without it the tokenize+explode
    # (the expensive narrow work) runs three times
    sh = track_persist(
        docs.select(
            F.col(id_col),
            F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("ngram"),
        )
    )
    freq = (
        sh.groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
        .orderBy(F.desc("df"), "ngram")
        .limit(limit)
    )
    per_doc = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_ngrams"))
    hits = (
        sh.join(F.broadcast(freq.select("ngram")), "ngram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("boiler_ngrams"))
    )
    return (
        per_doc.join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_ngrams"),
            F.coalesce(F.col("boiler_ngrams"), F.lit(0)).alias("boiler_ngrams"),
            (
                F.coalesce(F.col("boiler_ngrams"), F.lit(0)).cast("double")
                / F.col("n_ngrams").cast("double")
            ).alias("boiler_ratio"),
        )
    )


def vocab_coverage(
    docs: DataFrame,
    top_k: int = 1000,
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary induction with cumulative corpus coverage: the top-``top_k``
    tokens by occurrence count, each with the fraction of ALL token
    occurrences a vocabulary truncated at that rank would cover — the
    curve that sizes a tokenizer's vocab.

    Scale: token counts partial-aggregate map-side; the top-k is a
    TakeOrdered on the total order (count desc, token), so only ``top_k``
    rows (model-size, like IVF centroids) ever reach the cumulative
    window — that window runs on vocab-size data, never on the corpus.
    Totals ride a single-row broadcast; the cumulative sum is exact
    integer arithmetic, divided once at the end.
    """
    tok = docs.select(F.explode(tokens(F.col(text_col))).alias("token"))
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n_occurrences"))
    total = F.broadcast(counts.agg(F.sum("n_occurrences").alias("_total")))
    top = counts.orderBy(F.desc("n_occurrences"), "token").limit(top_k)
    w = (
        Window.orderBy(F.desc("n_occurrences"), "token")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn("cum_occurrences", F.sum("n_occurrences").over(w))
        .crossJoin(total)
        .select(
            "rank",
            "token",
            "n_occurrences",
            (
                F.col("cum_occurrences").cast("double")
                / F.col("_total").cast("double")
            ).alias("cum_coverage"),
        )
    )


def train_bpe_merges(
    docs: DataFrame,
    n_merges: int = 3,
    text_col: str = "text",
) -> list[tuple[int, str, str, int]]:
    """Train byte-pair-encoding merges on the corpus vocabulary — tokenizer
    induction, the step BEFORE ``bpe`` application.

    Classic word-level BPE: words (whitespace tokens, lowercased) weighted
    by occurrence count; each round counts adjacent symbol pairs, merges
    the most frequent (ties broken by pair string ascending), rewrites
    every word's symbol sequence, repeats.  Returns
    ``[(merge_idx, left, right, pair_count), ...]``.

    Engine-reproducible by construction: symbol sequences are SPACE-PADDED
    STRINGS and a merge is one ``replace(' L R ', ' LR ')`` — leftmost
    non-overlapping replacement, the exact greedy-left-to-right convention
    BPE defines, with identical semantics in Spark and DuckDB — so the
    whole training run is value-gated in SQL (``llm_bpe_train``), not just
    invariant-checked.  (No end-of-word marker: merges may cross the last
    symbol boundary only within a word, which is the textbook formulation
    minus the ``</w>`` refinement.  One more documented variant: the
    replace pattern consumes BOTH delimiter spaces, so an immediately
    repeated pair — ``e r e r`` — merges alternate occurrences in one
    round and the rest in later rounds; both engines share the behavior
    exactly, so the gate stays bit-exact.)

    Scale: the vocabulary frame (word, count) is the working set — corpus
    text is touched ONCE (groupBy word); each round is one pair-explode +
    count over vocab-size data and collects a single row (the argmax
    pair), i.e. model-size driver traffic like the IVF trainer.
    """
    from data_engineering_project_utn_spark.persist import track_persist

    vocab = track_persist(bpe_vocab_frame(docs, text_col))
    merges: list[tuple[int, str, str, int]] = []
    cur = vocab
    for i in range(n_merges):
        toks = F.split(F.trim(F.col("seq")), " ")
        pairs = F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
        top = (
            cur.select(F.explode(pairs).alias("pair"), "cnt")
            .groupBy("pair")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), "pair")
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair, n = top[0]["pair"], int(top[0]["n"])
        left, right = pair.split(" ", 1)
        merges.append((i, left, right, n))
        cur = track_persist(
            cur.select(
                F.replace(
                    F.col("seq"),
                    F.lit(f" {left} {right} "),
                    F.lit(f" {left}{right} "),
                ).alias("seq"),
                "cnt",
            )
        )
    return merges


def bpe_vocab_frame(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The weighted-vocabulary working frame BPE trains and applies on:
    (seq, cnt) with seq the space-padded character sequence of each
    distinct word.  Corpus text is touched once (groupBy word)."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.concat(
                F.lit(" "), F.concat_ws(" ", F.split(F.col("w"), "")), F.lit(" ")
            ).alias("seq"),
            "cnt",
        )
    )


def bpe_apply_merges(
    vocab: DataFrame, merges: list[tuple[int, str, str, int]]
) -> DataFrame:
    """Apply trained merges to the vocabulary frame, in training order —
    the same leftmost-non-overlapping ``replace`` the trainer used, so
    applying reproduces the trainer's final state exactly."""
    cur = vocab
    for _, left, right, _ in merges:
        cur = cur.select(
            F.replace(
                F.col("seq"), F.lit(f" {left} {right} "), F.lit(f" {left}{right} ")
            ).alias("seq"),
            "cnt",
        )
    return cur


def tfidf_frame(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    idf_scale: int = 10000,
) -> DataFrame:
    """Per-(doc, term) TF-IDF scores: (id, term, tf, doc_freq, score).

    score = tf · ⌊N·idf_scale / df⌋ — the idf is a FIXED-POINT rational
    (integer-divided BIGINT) instead of ln(N/df): monotone in N/df like the
    log form, but exact integer arithmetic end-to-end, so scores (and any
    top-k selected on them) are bit-identical across engines — the same
    determinism trade the decimal-sum layer makes (functions/scalar.py).

    Shape at scale: one explode scan → groupBy (doc, term) [shuffle 1,
    map-side combined], term document-frequencies derived FROM that frame
    (per-(doc,term) rows are unique, so df = count per term) [shuffle 2,
    vocab-sized output], equi-join back on term, and a 1-row broadcast for
    N.  No all-pairs, no window until a consumer asks for per-doc top-k."""
    toks = tokens(text_col)
    tf = (
        docs.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    n = docs.agg(F.count(F.lit(1)).alias("_n"))
    return (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select(
            id_col,
            "term",
            "tf",
            "doc_freq",
            (
                F.col("tf")
                * F.expr(f"(_n * CAST({idf_scale} AS BIGINT)) div doc_freq")
            ).alias("score"),
        )
    )


def tfidf_cosine_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    idf_scale: int = 10000,
    idf_cap: int = 10**8,
    max_block_df: int = 10,
    min_cosine: float = 0.5,
    block_n: int = 1,
) -> DataFrame:
    """Sparse TF-IDF cosine similarity join — the inverted-index lexical
    twin of the MinHash (Jaccard) and dense-embedding (cosine) near-dup
    paths: (id_a, id_b, cosine) for candidate pairs sharing at least one
    RARE blocking feature, scored by exact sparse cosine over unigram
    TF-IDF weights.

    Blocking: the inverted index is only expanded for blocking features
    with df ≤ ``max_block_df`` — pair space Σ_rare df² ≤ max_block_df·Σ df,
    never corpus² (stopword postings are never pair-expanded; a doc pair
    sharing ONLY ubiquitous features is not a near-dup candidate by
    construction).  ``block_n`` picks the blocking feature: 1 = the TF-IDF
    terms themselves (a natural-language corpus, where rare words exist);
    n > 1 = word n-gram shingles with 2 ≤ df ≤ ``max_block_df`` (small or
    synthetic vocabularies where every unigram is ubiquitous but shared
    word *sequences* still mark near-dups — the same feature space the
    MinHash path hashes).  df-1 features can never produce a pair, so the
    ≥ 2 floor on the shingle path is pure postings-size pruning.  Scoring
    always touches candidate pairs × the left doc's terms only.

    Determinism: weights are exact ints w = tf·min(⌊N·idf_scale/df⌋,
    idf_cap) (the cap bounds w² ≤ (tf·cap)² for DECIMAL(38) exactness at
    any corpus size — idf saturation, the standard smoothing), dots and
    norms accumulate in DECIMAL(38,0), and the only floating step is the
    final dot/√(na)·√(nb) with exact-int operands — bit-identical
    cross-engine."""
    tf = (
        docs.select(F.col(id_col).alias("did"), F.explode(tokens(text_col)).alias("term"))
        .groupBy("did", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    n = docs.agg(F.count(F.lit(1)).alias("_n"))
    w = tf.join(df, "term").crossJoin(F.broadcast(n)).select(
        "did",
        "term",
        (
            F.col("tf")
            * F.least(
                F.expr(f"(_n * CAST({idf_scale} AS BIGINT)) div doc_freq"),
                F.lit(idf_cap).cast("long"),
            )
        ).alias("w"),
        "doc_freq",
    )
    from data_engineering_project_utn_spark.persist import track_persist

    w = track_persist(w)
    norms = w.groupBy("did").agg(
        F.sum((F.col("w").cast("decimal(38,0)") * F.col("w"))).alias("nn")
    )
    if block_n > 1:
        cand = rare_shingle_pairs(
            docs, text_col, id_col, n=block_n, max_block_df=max_block_df
        ).select("id_a", "id_b")
    else:
        rare = w.filter(F.col("doc_freq") <= max_block_df).select("did", "term")
        cand = (
            rare.alias("a")
            .join(rare.alias("b"), "term")
            .filter(F.col("a.did") < F.col("b.did"))
            .select(F.col("a.did").alias("id_a"), F.col("b.did").alias("id_b"))
            .distinct()
        )
    wa = w.select(F.col("did").alias("id_a"), "term", F.col("w").alias("wa"))
    wb = w.select(F.col("did").alias("id_b"), "term", F.col("w").alias("wb"))
    dots = (
        cand.join(wa, "id_a")
        .join(wb, ["id_b", "term"])
        .groupBy("id_a", "id_b")
        .agg(F.sum((F.col("wa").cast("decimal(38,0)") * F.col("wb"))).alias("dot"))
    )
    na = norms.select(F.col("did").alias("id_a"), F.col("nn").alias("na"))
    nb = norms.select(F.col("did").alias("id_b"), F.col("nn").alias("nb"))
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("na").cast("double"))
                    * F.sqrt(F.col("nb").cast("double"))
                )
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= min_cosine)
    )


def rare_shingle_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    max_block_df: int = 10,
) -> DataFrame:
    """Weighted lexical-overlap pairs (id_a, id_b, w): doc pairs sharing
    rare word n-gram shingles (2 ≤ shingle df ≤ ``max_block_df``), with
    w = how many rare shingles they share.  The SAME rare-feature
    blocking as the shingle path of ``tfidf_cosine_pairs`` — shared here
    so the overlap GRAPH consumers (PageRank over documents,
    ``llm/graph.py``) and the similarity-scoring consumers block
    identically.  Pair space is Σ_rare df² ≤ max_block_df·Σ df, never
    corpus²; one explode scan + two key shuffles (shingle, then pair)."""
    shb = docs.select(
        F.col(id_col).alias("did"),
        F.explode(F.array_distinct(shingles(text_col, n))).alias("g"),
    )
    gdf = shb.groupBy("g").agg(F.count(F.lit(1)).alias("gdf"))
    rare = shb.join(
        gdf.filter((F.col("gdf") >= 2) & (F.col("gdf") <= max_block_df)), "g"
    ).select("did", "g")
    return (
        rare.alias("a")
        .join(rare.alias("b"), "g")
        .filter(F.col("a.did") < F.col("b.did"))
        .groupBy(F.col("a.did").alias("id_a"), F.col("b.did").alias("id_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: DataFrame,
    idf_scale: int = 10**4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-point BM25 retrieval scores (k1 = 1.2, b = 0.75) for every
    document containing at least one query term: (doc_id, score_fp).
    The corpus-ranking primitive the near-dup/similarity family lacks —
    query-relevance ordering with tf saturation and length normalization
    (Robertson & Walker SIGIR'94), here in EXACT integer arithmetic so
    the gate is bit-reproducible cross-engine:

    * idf is the RATIONAL Robertson ratio at fixed point —
      idf_q = ((2N − 2df + 1)·idf_scale) div (2df + 1), i.e.
      (N − df + ½)/(df + ½) without the log (the "linear idf" BM25
      variant; per-term monotone in df, always > 0 for df ≤ N).
    * the per-(term, doc) contribution clears every fraction to one
      integer division:  with k1 = 12/10, b = 3/4, AL = Σ doc lengths,
      N = corpus size, len = doc length:
        c = (idf_q · 88·AL·tf) div (40·AL·tf + 12·AL + 36·len·N)
      — numerator ≤ idf_q·88·AL·tf_max stays inside DECIMAL(38,0) up to
      ~2·10¹⁶ · 10¹⁹ bounds (documented: N ≤ 10¹², AL ≤ 10¹⁵, tf ≤ 100).
    * score_fp = Σ_t∈q∩doc c, accumulated in DECIMAL(38,0).

    Scale: tf/df/len are the TF-IDF frame's aggregations (map-side
    combined); N and AL are 1-row broadcasts; the query-term probe is a
    broadcast semi-join (query vocabularies are model-size), so the only
    data-sized shuffles are the tf groupBy and the final per-doc sum.
    """
    tf = (
        docs.select(F.col(id_col).alias("did"), F.explode(tokens(text_col)).alias("term"))
        .groupBy("did", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    from data_engineering_project_utn_spark.persist import track_persist

    tf = track_persist(tf)
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    lens = docs.select(
        F.col(id_col).alias("did"), F.size(tokens(text_col)).cast("long").alias("len")
    )
    nal = docs.select(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(F.size(tokens(text_col)).cast("long")).alias("_al"),
    )
    qt = query_terms.select("term").distinct()
    scored = (
        tf.join(F.broadcast(qt), "term")
        .join(dfq, "term")
        .join(lens, "did")
        .crossJoin(F.broadcast(nal))
        .select(
            "did",
            # Every product is promoted to DECIMAL(38,0) BEFORE multiplying
            # (ADVICE r07): in BIGINT, 88·AL·tf reaches 8.8e18 at the
            # documented bounds (within 5% of the 2^63 wrap) and 36·len·N
            # can exceed it outright — Spark would wrap silently where the
            # DuckDB oracle's HUGEINT keeps going.  DECIMAL(38,0) matches
            # the oracle's 128-bit behavior.
            F.expr(
                f"(CAST((2 * _n - 2 * doc_freq + 1) * {idf_scale} div"
                f" (2 * doc_freq + 1) AS DECIMAL(38,0))"
                " * (CAST(88 AS DECIMAL(38,0)) * _al * tf))"
                " div (CAST(40 AS DECIMAL(38,0)) * _al * tf"
                "      + CAST(12 AS DECIMAL(38,0)) * _al"
                "      + CAST(36 AS DECIMAL(38,0)) * len * _n)"
            ).alias("c"),
        )
    )
    return scored.groupBy(F.col("did").alias(id_col)).agg(
        F.sum("c").cast("decimal(38,0)").alias("score_fp")
    )


def bigram_surprisal(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document surprisal under an add-one-smoothed corpus bigram LM
    — the perplexity-filtering signal of CCNet-style curation (docs
    whose token transitions the corpus model finds improbable are noise
    / boilerplate / wrong-language candidates), computed in EXACT
    integer "bit" units so the gate is bit-reproducible:

    * the per-bigram surprisal −log₂ p̂(w₂|w₁) with
      p̂ = (c₁₂ + 1)/(c₁ + V) is quantized to
      ⌊log₂(c₁ + V)⌋ − ⌊log₂(c₁₂ + 1)⌋ — floor-log₂ is the integer
      bit length (Spark ``length(bin(x)) − 1`` ≡ DuckDB
      ``length(format('{:b}', x)) − 1``), an exact integer both engines
      compute identically (no transcendental ln anywhere).
    * output: (doc_id, bits_fp, n_bigrams) — total quantized bits and
      the bigram count, so callers rank by the exact rational
      bits_fp/n_bigrams with ONE float division at the end.

    Scale: the LM "training" is one groupBy over the corpus bigram
    stream (map-side combined; model state = distinct-bigram count, not
    corpus size); scoring joins each bigram occurrence to its two count
    frames on narrow keys and re-aggregates per doc — three key
    shuffles total, no driver-side model materialization (the LM stays
    distributed; only V, one scalar, is broadcast).
    """
    toks_df = docs.select(F.col(id_col).alias("did"), tokens(text_col).alias("toks"))
    bg = (
        toks_df.filter(F.size("toks") >= 2)
        .select(
            "did",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1), "
                    "i -> struct(element_at(toks, i) AS w1, "
                    "element_at(toks, i + 1) AS w2))"
                )
            ).alias("b"),
        )
        .select("did", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    from data_engineering_project_utn_spark.persist import track_persist

    bg = track_persist(bg)
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = docs.select(
        F.explode(tokens(text_col)).alias("t")
    ).agg(F.countDistinct("t").alias("_v"))
    scored = (
        bg.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "did",
            (
                (F.length(F.expr("bin(c1 + _v)")) - 1)
                - (F.length(F.expr("bin(c12 + 1)")) - 1)
            ).cast("long").alias("bits"),
        )
    )
    return scored.groupBy(F.col("did").alias(id_col)).agg(
        F.sum("bits").cast("long").alias("bits_fp"),
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
    )


def winnow_fingerprints(
    docs: DataFrame,
    w: int = 4,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer-Wilkerson-Aiken,
    SIGMOD'03 — the MOSS algorithm): slide a window of ``w`` consecutive
    n-gram digests over each document and keep the minimum digest per
    window (ties → leftmost, the deterministic variant: Spark's and
    DuckDB's struct ordering break ties identically on (digest, pos)).
    Output (doc_id, fp, fp_pos) — the selected fingerprint set, expected
    density 2/(w+1) of all shingles, with the winnowing GUARANTEE: any
    shared substring of ≥ w+n−1 tokens yields at least one shared
    fingerprint, so the winnowed index finds every long-enough overlap
    at a fraction of the full inverted index's size (the practical
    plagiarism/near-dup index builder; ``rolling_fingerprint`` is the
    degenerate whole-doc w=∞ case).

    Scale: one positional explode (narrow), one per-doc window min (the
    single shuffle, on the doc key), one distinct on the selected set —
    the index at rest is ~2/(w+1) the size of the positional span index
    (``llm/spans.py``) built from the same scan.  Docs with fewer than
    ``w`` shingles emit no fingerprints (no full window).
    """
    toks_df = docs.select(F.col(id_col).alias("did"), tokens(text_col).alias("toks"))
    k = F.size(F.col("toks"))
    idx = F.sequence(F.lit(1), F.greatest(k - F.lit(n - 1), F.lit(1)))
    sh = toks_df.select(
        "did",
        F.posexplode(
            F.transform(
                idx, lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("toks"), i, n)))
            )
        ).alias("pos0", "h"),
        (F.greatest(k - F.lit(n - 1), F.lit(1))).cast("long").alias("cnt"),
    ).select("did", (F.col("pos0") + 1).cast("long").alias("pos"), "h", "cnt")
    from pyspark.sql import Window

    wspec = Window.partitionBy("did").orderBy("pos").rowsBetween(0, w - 1)
    sel = sh.withColumn("m", F.min(F.struct("h", "pos")).over(wspec))
    return (
        sel.filter(F.col("pos") <= F.col("cnt") - F.lit(w) + 1)
        .select(
            F.col("did").alias(id_col),
            F.col("m.h").alias("fp"),
            F.col("m.pos").cast("long").alias("fp_pos"),
        )
        .distinct()
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window token chunking — the context-window segmentation
    every RAG / pretraining prep pipeline runs before embedding or
    packing: chunk i covers tokens [i·stride, i·stride + chunk_tokens)
    of the shared whitespace tokenization (``tokens`` — the chunk text
    is the single-space rejoin, so re-tokenizing a chunk reproduces its
    token slice exactly).  ``stride < chunk_tokens`` yields the overlap
    (chunk_tokens − stride tokens) that keeps boundary-spanning facts
    retrievable.

    Chunk count = 1 + ⌈max(n − chunk_tokens, 0) / stride⌉ (n = doc
    tokens): every token is covered, the final chunk may be short, a doc
    with n ≤ chunk_tokens is exactly one chunk, and empty/whitespace
    docs yield NO rows (the tokenizer's empty-array contract).

    Scale shape: tokenize + per-doc index explode + slice — all narrow
    (scan-speed, no shuffle, no UDF); output rows ≈ Σ n_i / stride.
    Columns: id_col, chunk_id, n_tokens, chunk_text."""
    if not 0 < stride <= chunk_tokens:
        # stride > chunk_tokens would leave token GAPS between chunks
        # (silently breaking the coverage contract) and can emit phantom
        # empty chunks whose slice starts past the end of the doc
        raise ValueError(
            f"stride must be in (0, chunk_tokens], got stride={stride}, "
            f"chunk_tokens={chunk_tokens}"
        )
    t = tokens(F.col(text_col))
    n = F.size(t)
    n_chunks = (
        F.lit(1)
        + F.floor(
            (F.greatest(n - F.lit(chunk_tokens), F.lit(0)) + F.lit(stride - 1))
            / F.lit(stride)
        )
    ).cast("int")
    return (
        docs.filter(n > 0)
        .select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
            t.alias("_t"),
        )
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.size(F.slice(F.col("_t"), F.col("chunk_id") * stride + 1, chunk_tokens))
            .cast("long")
            .alias("n_tokens"),
            F.array_join(
                F.slice(F.col("_t"), F.col("chunk_id") * stride + 1, chunk_tokens), " "
            ).alias("chunk_text"),
        )
    )


def collocation_pmi(
    docs: DataFrame,
    text_col: str = "text",
    window: int = 3,
    min_support: int = 5,
    topk: int = 20,
) -> DataFrame:
    """Collocation extraction by windowed PMI (Church & Hanks '90): ordered
    token pairs (a, b) with b at most ``window`` positions after a, scored
    by pointwise mutual information on the FIXED-POINT integer log₂
    (``functions.scalar.plog2_sql`` — the engine-reproducible log), as
    pmi_fp = plog2(c_ab) + plog2(P) − plog2(c_a→) − plog2(→c_b), where
    c_a→ / →c_b are a's left-slot and b's right-slot occurrence counts
    and P the total window-pair count.  The 4-term sum keeps every plog2
    argument an independent count (each well under the 2⁴⁶ contract at
    any corpus size), unlike plog2(c_ab·P) whose product overflows the
    fixed-point domain at ~10¹³ pairs.

    The POSITIONAL complement of the document-level 2-itemset gate
    (``llm_token_pairs``): itemset support is order- and distance-blind;
    collocations demand adjacency.  Top-k by (pmi_fp DESC, a, b) under a
    total order; ``min_support`` keeps hapax pairs (whose PMI is
    maximal by construction) out.

    Scale: pairs build NARROW per row (window·len structs via in-row
    transforms — no self-join on positions); the shuffles are the
    (a, b) / a / b count aggregates (map-side combined) and P is a
    1-row broadcast.  Work is window·tokens — linear in corpus size.
    """
    from data_engineering_project_utn_spark.functions.scalar import plog2_sql
    from data_engineering_project_utn_spark.persist import track_persist

    pair_t = "array<struct<a:string,b:string>>"

    def gap_pairs(g: int) -> Column:
        return (
            F.when(
                F.size("_t") > g,
                F.transform(
                    F.sequence(F.lit(1), F.size("_t") - g),
                    lambda i: F.struct(
                        F.element_at(F.col("_t"), i).alias("a"),
                        F.element_at(F.col("_t"), i + g).alias("b"),
                    ),
                ),
            )
            .otherwise(F.array().cast(pair_t))
        )

    prs = track_persist(
        docs.select(tokens(text_col).alias("_t"))
        .select(
            F.explode(
                F.flatten(F.array(*[gap_pairs(g) for g in range(1, window + 1)]))
            ).alias("_p")
        )
        .select(F.col("_p")["a"].alias("a"), F.col("_p")["b"].alias("b"))
    )
    cab = prs.groupBy("a", "b").agg(F.count(F.lit(1)).cast("long").alias("support"))
    ca = prs.groupBy("a").agg(F.count(F.lit(1)).cast("long").alias("_ca"))
    cb = prs.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("_cb"))
    tot = prs.agg(F.count(F.lit(1)).cast("long").alias("_p_total"))
    pmi = (
        F.expr(plog2_sql("support"))
        + F.expr(plog2_sql("_p_total"))
        - F.expr(plog2_sql("_ca"))
        - F.expr(plog2_sql("_cb"))
    ).cast("long")
    return (
        cab.filter(F.col("support") >= int(min_support))
        .join(ca, "a")
        .join(cb, "b")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("a").alias("tok_a"),
            F.col("b").alias("tok_b"),
            "support",
            pmi.alias("pmi_fp"),
        )
        .orderBy(F.desc("pmi_fp"), "tok_a", "tok_b")
        .limit(int(topk))
    )
