"""Exact duplicated-substring span detection (suffix-array-style dedup,
re-expressed as a positional n-gram index).

Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better") remove *substrings* repeated across a corpus, not just whole
near-duplicate documents — the reference pipeline's dedup layer stops at
document granularity, so this is the span-level complement.  A distributed
suffix array is impractical on Spark; the standard scalable equivalent is
a positional n-gram index: a token position is "duplicated" iff it is
covered by some n-gram that occurs ≥ 2 times corpus-wide.  That coverage
union is computed exactly here:

1. ``shingle_positions`` — narrow projection: every n-gram with its
   1-based start position (posexplode of the shingle array).
2. n-gram occurrence counts — ONE groupBy shuffle on the n-gram string
   (map-side partial agg; at 100 TB substitute the count-min sketch in
   ``llm/sketch.py`` for the exact counts if the n-gram key space itself
   becomes the bottleneck — the ≥ 2 filter only ever *overcounts* with CM,
   an acceptable one-sided error for dedup).
3. join positions back to surviving n-grams — equi-join on the same key,
   so AQE can ride the groupBy's partitioning.
4. per-document interval union — a lag window + running-sum span id,
   partitioned by doc_id: positions p, q chain into one span iff
   q − p ≤ n − 1 (their covered intervals [p, p+n−1], [q, q+n−1] touch or
   overlap), so span token counts are EXACT union sizes, never
   double-counted.

Nothing scales with corpus size beyond the narrow scan + two key-partition
shuffles; there is no all-pairs stage anywhere (contrast MinHash candidate
pairs in llm/dedup.py — this is a different axis: position-exact, not
document-similarity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_engineering_project_utn_spark.llm import text as tx


def shingle_positions(
    docs: DataFrame, n: int = 5, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, ntok, pos, sh): every n-gram shingle with its 1-based start
    position.  Docs shorter than n tokens yield their whole text as the
    single shingle at pos 1 (mirrors ``llm.text.shingles``)."""
    toks = tx.tokens(text_col)
    return (
        docs.select(
            F.col(id_col),
            F.size(toks).cast("long").alias("ntok"),
            F.posexplode(tx.shingles(text_col, n)).alias("pos0", "sh"),
        )
        .select(
            id_col, "ntok", (F.col("pos0") + 1).cast("long").alias("pos"), "sh"
        )
    )


def duplicated_span_frame(
    docs: DataFrame,
    n: int = 5,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Maximal duplicated spans per document.

    Output: (id, ntok, start_pos, end_pos, span_len) where
    [start_pos, end_pos] is a maximal run of token positions covered by
    n-grams occurring ≥ ``min_count`` times corpus-wide (within-doc repeats
    count — self-repetition is duplication for LM training too).
    ``end_pos`` is clamped to ntok for sub-n documents."""
    from data_engineering_project_utn_spark.persist import track_persist

    # the positional frame feeds both the occurrence count and the join
    # back — persist so the interpreted shingle explode runs once (perf
    # pin: releasable any time, recompute is value-identical; at cluster
    # scale prefer re-scanning over persisting a corpus-sized explode)
    sp = track_persist(shingle_positions(docs, n, text_col, id_col))
    dup_sh = (
        sp.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("occ"))
        .filter(F.col("occ") >= min_count)
        .select("sh")
    )
    dup_pos = sp.join(dup_sh, "sh").select(id_col, "ntok", "pos")
    return _interval_union(dup_pos, n, id_col)


def _interval_union(dup_pos: DataFrame, n: int, id_col: str) -> DataFrame:
    """Merge duplicated n-gram start positions into maximal covered spans:
    positions p, q chain iff q − p ≤ n − 1 (their intervals touch), so
    Σ span_len is the EXACT size of the coverage union.  Both windows and
    the final groupBy partition on the doc key — one shuffle class."""
    w = Window.partitionBy(id_col).orderBy("pos")
    brk = (
        F.when(F.col("pos") - F.lag("pos").over(w) <= n - 1, F.lit(0))
        .otherwise(F.lit(1))
        .alias("brk")
    )
    runs = dup_pos.select(id_col, "ntok", "pos", brk)
    span_id = F.sum("brk").over(
        Window.partitionBy(id_col).orderBy("pos").rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    spans = runs.select(id_col, "ntok", "pos", span_id.alias("span_id"))
    start = F.min("pos").alias("start_pos")
    end = F.least(F.max("pos") + n - 1, F.first("ntok")).alias("end_pos")
    return (
        spans.groupBy(id_col, "span_id")
        .agg(F.first("ntok").alias("ntok"), start, end)
        .select(
            id_col,
            "ntok",
            "start_pos",
            "end_pos",
            (F.col("end_pos") - F.col("start_pos") + 1).alias("span_len"),
        )
    )


def duplicated_span_frame_cm(
    docs: DataFrame,
    n: int = 5,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    depth: int = 3,
    width: int = 8192,
) -> DataFrame:
    """Count-min twin of ``duplicated_span_frame`` — the escape hatch
    SCALE.md names for petabyte n-gram key spaces, made real and gateable
    (VERDICT r06 #7): the exact per-n-gram occurrence count (whose key
    space grows with the corpus) is swapped for a count-min estimate
    (state ≤ depth·width counters at ANY corpus size, mergeable across
    shards — ``llm/sketch.cm_merge``).

    One-sided by construction: CM never undercounts, so every position
    the exact pass marks duplicated is also marked here (the covered
    position set is a SUPERSET — asserted against the exact frame in
    tests/test_llm_ops.py); the only error is extra false-positive spans
    from bucket collisions, the acceptable direction for dedup (scrub a
    little extra, never miss a duplicate).  Same plan shape as the exact
    path with the n-gram-key groupBy replaced by the (d, bucket) counter
    groupBy — the shuffle key space drops from |distinct n-grams| to
    depth·width."""
    from data_engineering_project_utn_spark.llm import sketch as sk
    from data_engineering_project_utn_spark.persist import track_persist

    sp = track_persist(shingle_positions(docs, n, text_col, id_col))
    counters = sk.cm_counters(sp.select("sh"), "sh", depth=depth, width=width)
    est = sk.cm_estimates(
        counters, sp.select("sh").distinct(), "sh", depth=depth, width=width
    )
    dup_sh = est.filter(F.col("cm_estimate") >= min_count).select("sh")
    dup_pos = sp.join(dup_sh, "sh").select(id_col, "ntok", "pos")
    return _interval_union(dup_pos, n, id_col)


def ngram_count_index(
    corpus: DataFrame, n: int = 5, text_col: str = "text"
) -> DataFrame:
    """The corpus's at-rest n-gram occurrence index: (sh, corpus_occ) —
    what a deployment persists (parquet, bucketed by ``sh``) and maintains
    additively as batches land, so incremental span checks never re-scan
    corpus positions."""
    return (
        corpus.select(F.explode(tx.shingles(text_col, n)).alias("sh"))
        .groupBy("sh")
        .agg(F.count(F.lit(1)).alias("corpus_occ"))
    )


def incremental_span_frame(
    incoming: DataFrame,
    corpus: DataFrame | None = None,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    index: DataFrame | None = None,
) -> DataFrame:
    """Duplicated spans of an INCOMING batch against a corpus at rest —
    the production shape of span dedup: a new crawl batch is checked
    without re-scanning corpus positions.

    The corpus contributes only its aggregated n-gram count index
    (|index| ≪ corpus positions — this is what a deployment stores at
    rest, bucketed by the n-gram key, and maintains additively as batches
    land).  An incoming n-gram is duplicated iff its occurrences in the
    batch plus the index count reach 2, which is EXACTLY the global
    occ ≥ 2 rule on corpus ∪ batch restricted to batch docs — the oracle
    for ``llm_incremental_dup_spans`` proves that equivalence
    cross-engine.  Corpus-side cost: one groupBy to the index, then an
    equi-join against only the batch's n-grams; never corpus² and never
    a second corpus scan per batch.  Pass ``index`` (a
    ``ngram_count_index`` frame, e.g. read back from parquet at rest) to
    skip the corpus scan entirely — the streaming curation loop does."""
    from data_engineering_project_utn_spark.persist import track_persist

    if (corpus is None) == (index is None):
        raise ValueError("provide exactly one of corpus= or index=")
    sp_in = track_persist(shingle_positions(incoming, n, text_col, id_col))
    idx_co = index if index is not None else ngram_count_index(corpus, n, text_col)
    occ_in = sp_in.groupBy("sh").agg(F.count(F.lit(1)).alias("batch_occ"))
    dup_sh = (
        occ_in.join(idx_co, "sh", "left")
        .filter(
            F.col("batch_occ") + F.coalesce(F.col("corpus_occ"), F.lit(0)) >= 2
        )
        .select("sh")
    )
    dup_pos = sp_in.join(dup_sh, "sh").select(id_col, "ntok", "pos")
    return _interval_union(dup_pos, n, id_col)


def duplicated_span_stats(
    docs: DataFrame,
    n: int = 5,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document duplication accounting over the exact span union:
    (id, n_spans, dup_tokens, total_tokens, dup_fraction).  dup_fraction
    is one division of two exact BIGINTs → bit-identical cross-engine."""
    return span_stats(duplicated_span_frame(docs, n, min_count, text_col, id_col), id_col)


def span_stats(spans: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Aggregate a span frame to per-doc accounting (see
    ``duplicated_span_stats``); also used by the incremental path."""
    return spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("span_len").alias("dup_tokens"),
        F.first("ntok").alias("total_tokens"),
        (
            F.sum("span_len").cast("double")
            / F.first("ntok").cast("double")
        ).alias("dup_fraction"),
    )


def scrub_spans(
    docs: DataFrame,
    n: int = 5,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rewrite the corpus with duplicated spans REMOVED — the transform the
    span frame exists to drive (Lee et al. cut duplicated substrings out of
    the training text; this is the aggressive remove-every-occurrence
    variant — pair with document-level exact dedup first if a canonical
    copy of whole-doc duplicates should survive).

    Output: (id, kept_tokens, removed_tokens, text) with ``text`` the
    space-rejoin of the surviving tokens in original order (empty string
    when a doc is fully duplicated).  Shape: the span frame's covered
    positions explode to ≤ dup_tokens rows, anti-join the positional token
    frame on (id, pos) — both sides partition on the doc key, no new
    shuffle class beyond the span build itself."""
    toks = tx.tokens(text_col)
    tok_pos = docs.select(
        F.col(id_col),
        F.posexplode(toks).alias("pos0", "tok"),
    ).select(id_col, (F.col("pos0") + 1).cast("long").alias("pos"), "tok")
    covered = duplicated_span_frame(docs, n, min_count, text_col, id_col).select(
        id_col,
        F.explode(F.sequence(F.col("start_pos"), F.col("end_pos"))).alias("pos"),
    )
    kept = tok_pos.join(covered, [id_col, "pos"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("kept_tokens"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("tok")))
                ),
                lambda s: s["tok"],
            ),
        ).alias("text"),
    )
    base = docs.select(
        F.col(id_col), F.size(tx.tokens(text_col)).cast("long").alias("ntok")
    )
    return (
        base.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("kept_tokens", F.lit(0)).alias("kept_tokens"),
            (F.col("ntok") - F.coalesce("kept_tokens", F.lit(0))).alias(
                "removed_tokens"
            ),
            F.coalesce("text", F.lit("")).alias("text"),
        )
    )


def write_span_index_bucketed(
    index: DataFrame, table_name: str, path: str, buckets: int = 64
) -> None:
    """Persist the n-gram count index BUCKETED on the n-gram key — the
    at-rest layout for incremental span dedup at scale: per-batch probes
    join on ``sh``, and a bucketed index satisfies that clustering from
    disk, so the (corpus-sized) index is NEVER re-shuffled per batch —
    only the incoming batch exchanges (plan-asserted in
    ``test_bucketed_join.test_span_index_bucketed_probe``).  Maintain it
    additively: union new batches' counts and rewrite per partition, or
    compact periodically."""
    (
        index.write.bucketBy(buckets, "sh")
        .sortBy("sh")
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(table_name)
    )
