"""Physical-plan regression tests (SURVEY.md §4.2): the plan properties we
rely on at 100 TB must hold at any SF — column pruning into the scan,
filter pushdown, broadcast for small dims, and no accidental
nested-loop/cartesian joins on the big-table paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_project_utn_spark.plans import all_queries

QUERIES = all_queries()


def _plan(spark, sf_dir, name: str) -> str:
    # Scan-metadata entries (PushedFilters/DataFilters/ReadSchema) are
    # truncated at spark.sql.maxMetadataStringLength (default 100 chars),
    # and conjunct ORDER inside them is session-state-dependent — so a
    # literal grepped below can silently fall past the cut when the suite
    # warms the session differently than a lone test does (VERDICT r09 #1).
    # Raise the cap for the duration of the explain so every string
    # assertion in this module sees the full metadata.
    key = "spark.sql.maxMetadataStringLength"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "8192")
    try:
        df = QUERIES[name].build(spark, sf_dir)
        return df._jdf.queryExecution().executedPlan().toString()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def _pushed_filters(scan_line: str) -> str:
    """The bracketed PushedFilters list of a FileScan line, EXCLUDING the
    trailing ReadSchema — a naive split-tail includes ReadSchema, which
    always names every read column, so `col in tail` stays true even
    after a pushdown regresses to a post-scan Filter (the exact
    regression these asserts exist to catch)."""
    tail = scan_line.split("PushedFilters", 1)[-1]
    return tail.split("ReadSchema", 1)[0]


def test_interval_core_never_nested_loop(spark, sf_dir):
    """The as-of merge (J4 replacement) must stay a hash/sort-merge path —
    a BNLJ here is quadratic at scale."""
    plan = _plan(spark, sf_dir, "ri_output_freshness")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_star_join_broadcasts_dimensions(spark, sf_dir):
    """nation/region/supplier are broadcast-side; lineitem never shuffles
    through a nested loop."""
    plan = _plan(spark, sf_dir, "rl_nation_revenue")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    """c_mktsegment = 'BUILDING' must be evaluated at the customer scan,
    not after the join."""
    plan = _plan(spark, sf_dir, "rl_top_revenue_orders")
    scan_lines = [ln for ln in plan.splitlines() if "FileScan" in ln and "c_mktsegment" in ln]
    assert scan_lines, "customer scan not found"
    assert any("BUILDING" in ln for ln in scan_lines), "mktsegment filter not pushed to scan"


def test_column_pruning_pricing_summary(spark, sf_dir):
    """Q1-style scan must read only the 7 needed lineitem columns, not all 16."""
    plan = _plan(spark, sf_dir, "rl_pricing_summary")
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert scans
    li_scan = next(ln for ln in scans if "l_quantity" in ln)
    cols = li_scan.split("[", 1)[1].split("]", 1)[0].split(",")
    assert len(cols) <= 8, f"lineitem scan reads {len(cols)} columns: {cols}"
    assert not any("l_comment" in c for c in cols)


def test_knn_broadcast_is_single_row_side(spark, sf_dir):
    """Brute-force kNN: the only nested-loop join allowed is the broadcast
    of the single query vector (corpus × 1 row — linear, by design)."""
    plan = _plan(spark, sf_dir, "llm_knn_cosine")
    if "BroadcastNestedLoopJoin" in plan:
        # the broadcast side must be the vec_id = 0 singleton
        assert "(vec_id" in plan and "= 0)" in plan.replace("#", " #").replace("L", "")


@pytest.mark.parametrize("name", ["ri_decile_histogram", "ri_ingestion_freshness"])
def test_historical_chain_no_cartesian(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    assert "CartesianProduct" not in plan


def test_decile_headline_has_no_single_partition_stage(spark, sf_dir):
    """The benched ri_decile_histogram must run the distributed NTILE: a
    global-window NTILE plans an Exchange SinglePartition — the one-reducer
    bottleneck at 100 TB.  The window twin keeps that stage by design."""
    headline = _plan(spark, sf_dir, "ri_decile_histogram")
    assert "SinglePartition" not in headline
    window_twin = _plan(spark, sf_dir, "ri_decile_histogram_window")
    assert "SinglePartition" in window_twin


def test_sorted_neighborhood_linear_plan(spark, sf_dir):
    """Merge/purge blocking must keep its two scale pins: the neighborhood
    pairing is an EQUI-join on rank-block (a theta join on rank distance
    would plan BNLJ — quadratic), and the global rank comes from the
    distributed range-exchange machinery (no SinglePartition window)."""
    plan = _plan(spark, sf_dir, "llm_sorted_neighborhood")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan


def test_editdist_verify_rides_banded_candidates(spark, sf_dir):
    """Levenshtein verification must stay filter-verify: pairs come from
    the band-bucket equi-join, never an all-pairs text comparison — and
    the DP itself must be the THRESHOLD-BANDED form (O(L·εL) diagonal
    band with the per-row budget column, not the full O(L²) matrix),
    behind the integer length prefilter."""
    plan = _plan(spark, sf_dir, "llm_editdist_neardup")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the 3-arg banded form (Catalyst collapses the budget column into the
    # call: levenshtein(_ta#…, _tb#…, Some(cast(…)))), plus the integer
    # length prefilter
    import re

    assert re.search(r"levenshtein\(_ta#\d+, _tb#\d+, Some\(", plan), plan
    assert re.search(r"abs\(\(length\(_ta#\d+\) - length\(_tb#\d+\)\)\)", plan), plan


@pytest.mark.parametrize(
    "name",
    [
        "llm_minhash_neardup",
        "llm_editdist_neardup",
        "llm_bottomk_neardup",
        "llm_minhash_estimate_error",
    ],
)
def test_dedup_verify_joins_never_broadcast_corpus(spark, sf_dir, name):
    """The verify sides (per-doc shingle sets / texts) and the banded
    self-join are CORPUS-scale, but their static size estimate derives
    from compressed parquet bytes — without the merge hints the planner
    broadcasts frames whose in-memory relation is 10-50x larger
    (measured: an 8 GB driver OOM at the sf4 probe when three such
    pipelines composed in one job).  These plans must carry NO broadcast
    exchange at all."""
    plan = _plan(spark, sf_dir, name)
    assert "BroadcastExchange" not in plan
    assert "SortMergeJoin" in plan


def _broadcast_subtrees(plan: str) -> list:
    """Subtree text under each BroadcastExchange node in a toString plan
    (children are the following lines with deeper tree-prefix depth)."""
    import re

    lines = plan.splitlines()

    def depth(ln: str) -> int:
        return len(re.match(r"^[\s:+|-]*", ln).group(0))

    out = []
    for i, ln in enumerate(lines):
        if "BroadcastExchange" in ln:
            d = depth(ln)
            sub = []
            for l2 in lines[i + 1:]:
                if l2.strip() and depth(l2) <= d:
                    break
                sub.append(l2)
            out.append("\n".join(sub))
    return out


@pytest.mark.parametrize(
    "name", ["llm_incremental_dedup", "llm_incremental_editdist"]
)
def test_incremental_gates_no_static_estimate_broadcast(spark, sf_dir, name):
    """The registered incremental gates replay 1/3 of the CORPUS as the
    "incoming" batch — corpus-proportional, so NEITHER side of the band
    probe may be a static-estimate broadcast build (ADVICE r12: the old
    batch-side F.broadcast pin was itself the 8 GB-driver OOM class for
    these gates; the bounded-batch broadcast is now the streaming
    callers' explicit opt-in, tested below).  Any broadcast the planner
    keeps must be stat-accurate (a persisted InMemoryRelation /
    checkpointed RDD — sizes the planner actually knows, which flip to
    SMJ at real scale), never a parquet-derived static estimate: no
    doc_id%3-filtered scan, either polarity, under any
    BroadcastExchange."""
    import re

    plan = _plan(spark, sf_dir, name)
    assert "SortMergeJoin" in plan  # band probe + corpus verify sides
    split_filter = re.compile(r"\(doc_id#\d+L? % 3\)")
    for s in _broadcast_subtrees(plan):
        # the subtree ABOVE the first stat-accurate scan: no parquet
        # FileScan and no %3-split filter may feed the build directly
        # (an InMemoryTableScan's printout includes its cached LINEAGE,
        # which legitimately names both — that's below the
        # materialization boundary, where the planner has real sizes)
        lines = s.splitlines()
        cut = next(
            (i for i, ln in enumerate(lines)
             if "InMemoryTableScan" in ln or "ExistingRDD" in ln),
            None,
        )
        assert cut is not None, s
        head = "\n".join(lines[:cut])
        assert "FileScan" not in head, s
        assert not split_filter.search(head), s


def test_incremental_streaming_contract_broadcasts_the_batch_side(spark, sf_dir):
    """The streaming opt-in (``broadcast_batch=True``, what the
    foreachBatch factories pass): a bounded micro-batch IS pinned as the
    broadcast build side, keeping the per-trigger probe shuffle-free on
    the corpus side."""
    from data_engineering_project_utn_spark.llm import dedup as dd
    from data_engineering_project_utn_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    batch = d.filter(F.col("doc_id") <= 5)
    corpus = d.filter(F.col("doc_id") > 5)
    pairs = dd.incremental_neardup(batch, corpus, broadcast_batch=True)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan, plan
    subs = _broadcast_subtrees(plan)
    assert any("band_idx" in s or "band_hash" in s or "pythonUDF" in s
               or "InMemoryTableScan" in s for s in subs), plan


@pytest.mark.parametrize(
    "name", ["llm_dedup_golden_record", "llm_combined_dedup_clusters_at_rest"]
)
def test_cluster_gates_broadcast_only_stat_accurate_frames(spark, sf_dir, name):
    """Cluster-consuming gates may broadcast ONLY frames whose size the
    planner actually knows (persisted InMemoryRelations / checkpointed
    RDDs from the label-propagation loop — data-driven decisions that
    flip to SMJ at real scale), never a static-estimate parquet
    derivation (the 10-50x underestimate class).  The corpus-scale
    lengths join in golden_record is merge-pinned for the same reason."""
    plan = _plan(spark, sf_dir, name)
    for s in _broadcast_subtrees(plan):
        assert ("InMemoryTableScan" in s) or ("ExistingRDD" in s), s


def test_pipeline_manifest_no_single_partition(spark, sf_dir):
    """The end-to-end curation composition must inherit the distributed
    sharding machinery — a global-window row_number would plan an Exchange
    SinglePartition (the one-reducer bottleneck)."""
    plan = _plan(spark, sf_dir, "llm_pipeline_manifest")
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name",
    [
        "ri_decile_histogram",       # distributed NTILE + range partition
        "rl_ema_scan",               # segmented-scan EMA composition
        "llm_embedding_stats",       # fixed-point decimal sums
        "llm_mixture_apply",         # hash-threshold resampling
        "llm_bpe_train",             # iterative merge training
        "llm_dup_spans",             # positional index + interval union
        "llm_span_scrub",            # ordered rejoin after anti-join
        "llm_tfidf_topk",            # fixed-point idf + windowed top-k
        "llm_hll_by_source",         # grouped sketch + decimal numerator
        "llm_jaccard_prefix_join",   # r07: per-doc rank window + integer threshold
        "llm_incremental_snm",       # r13: block-start ranking + insertion-rank probe
        "llm_bm25_topk",             # r07: integer-division scoring, scalar broadcasts
        "llm_winnowing",             # r07: windowed minima + df-capped pair join
        "llm_gram_matrix",           # r07: 2080-key decimal groupBy
        "llm_dsir_importance",       # r07: width-bounded counts + plog2 bits
    ],
)
def test_partitioning_independence(spark, sf_dir, name):
    """The determinism contract, tested head-on: the same query must be
    BIT-IDENTICAL under different shuffle-partition counts (different
    partial-aggregation trees, different range boundaries)."""
    from tests.oracle_harness import canonicalize

    q = QUERIES[name]
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = canonicalize(q.build(spark, sf_dir).toPandas())
        spark.catalog.clearCache()
        spark.conf.set("spark.sql.shuffle.partitions", "11")
        b = canonicalize(q.build(spark, sf_dir).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
        spark.catalog.clearCache()
    assert a == b


@pytest.mark.parametrize(
    "name",
    ["llm_knn_join_auto", "llm_embedding_neardup_auto", "llm_embedding_dedup_clusters_auto"],
)
def test_auto_lsh_paths_no_quadratic_join(spark, sf_dir, name):
    """The auto-sized LSH paths must stay equi-joins on block keys — a
    BNLJ/cartesian would silently reintroduce the N² pair space the
    derived sizing exists to prevent."""
    plan = _plan(spark, sf_dir, name)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize("name", ["llm_dup_spans", "llm_dup_span_list"])
def test_span_dedup_stays_equi_join(spark, sf_dir, name):
    """The positional n-gram index joins positions back to duplicated
    n-grams on the n-gram string — an equi-join at every scale; a
    BNLJ/cartesian would be an all-pairs regression."""
    plan = _plan(spark, sf_dir, name)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bloom_probe_broadcasts_bits_not_corpus(spark, sf_dir):
    """The Bloom bit frame (≤ m rows) must broadcast into the probe join;
    the corpus side must never plan a sort-merge against it (which would
    shuffle the corpus on bit positions)."""
    plan = _plan(spark, sf_dir, "llm_bloom_decontam")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2  # bits probe + exact semi


@pytest.mark.parametrize(
    "name",
    [
        "llm_tfidf_cosine_pairs",
        "llm_pagerank",
        "llm_pagerank_weighted",
        "llm_rrf_ensemble",
        "llm_minhash_neardup",
        "rl_customers_without_big_orders",
        "llm_pca_grid_ann_multiprobe",
        "llm_gram_matrix",
        "llm_jaccard_prefix_join",
        "llm_graph_triangles",
        "llm_bm25_topk",
        "llm_bigram_surprisal",
        "llm_dsir_importance",
        "llm_containment",
        "llm_dedup_keepers_quality",
        "llm_stratified_exact",
        "llm_cross_source_dups",
        "llm_containment_sketch",
        "llm_contamination_fraction",
        "llm_cluster_size_stats",
        "llm_winnowing",
        "llm_pq_adc",
        "llm_ivfpq_ann",
        "rl_sole_late_supplier",
        "rl_small_quantity_revenue",
        "llm_dedup_agreement",
        "llm_pq_recall",
        "llm_pq_trained",
        "llm_jaccard_prefix_pos",
        "llm_pq_recall_trained",
        "rl_event_transitions",
        "llm_token_pairs",
        "rl_cohort_retention",
        "rl_funnel",
        "llm_zipf_slope",
        "llm_graph_triangles_degree",
        "llm_pq_recall_residual",
        "llm_ccnet_buckets",
        "llm_semdedup_pairs",
        "llm_semdedup_bcast",
        "llm_pq_recall_opq",
        "llm_ccnet_assign",
        "llm_ivfpq_residual_bcast",
        "rl_returned_item_ranking",
        "rl_promo_revenue",
        "rl_top_supplier_revenue",
        "rl_large_volume_orders",
        "rl_bracket_revenue",
        "llm_mmr_topk",
        "llm_temperature_mixture",
        "llm_ann_rank_eval",
        "rl_global_sales_opportunity",
        "llm_ngram_novelty",
        "llm_packing_waste",
        "rl_nation_trade_volume",
        "rl_market_share",
        "llm_pq_residual_trained",
        "llm_ivfpq_residual_ann",
        "rl_rfm_segments",
        "llm_sq8_error",
        "llm_gopher_filters",
        "rl_monthly_growth",
        "rl_min_cost_supplier",
        "rl_excess_stock_suppliers",
        "rl_forecast_revenue_change",
        "rl_product_type_profit",
        "rl_parts_supplier_counts",
        "rl_important_stock",
        "llm_temperature_mixture_t25",
        "llm_mmr_topk_ann",
        "llm_ivfpq_rank_eval",
        "llm_semdedup_capped",
        "llm_semdedup_2level",
        "llm_ivf_2level_ann",
        "rl_shipping_priority_mix",
        "llm_2level_rank_eval",
    ],
)
def test_graph_family_gates_nonempty(spark, sf_dir, name):
    """VERDICT r06 #1: an oracle gate that returns 0 rows compares empty
    to empty and proves nothing about the arithmetic it claims to verify.
    The graph/similarity family must produce rows on the driver corpus at
    every SF — rare-5-gram-shingle blocking (llm/text.rare_shingle_pairs)
    guarantees a non-empty candidate set here, and this floor makes any
    future vacuous-gate regression a loud test failure instead of a green
    empty-vs-empty row."""
    assert QUERIES[name].build(spark, sf_dir).limit(1).count() > 0


def _strip_cached_subtrees(plan: str) -> str:
    """Drop every InMemoryRelation subtree from a physical-plan string.

    ``InMemoryRelation.toString`` re-embeds the plan that BUILT the cache,
    so a substring count over the raw text depends on session cache state
    (warm persisted frames textually reprint their child plans — r08 saw
    llm_ccnet_buckets swing 3 -> 5 BNLJ "nodes" between isolated and
    full-suite runs).  Removing the cached subtrees leaves exactly the
    LIVE operator nodes, making plan budgets cache-state-independent
    (ADVICE r08)."""
    out = []
    skip_indent = None
    for line in plan.splitlines():
        indent = len(line) - len(line.lstrip(" :+-*"))
        if skip_indent is not None:
            if indent > skip_indent:
                continue
            skip_indent = None
        if "InMemoryRelation" in line:
            skip_indent = indent
            continue
        out.append(line)
    return "\n".join(out)


def _single_partition_window_sorts(plan: str) -> int:
    """Count Exchange SinglePartition nodes that feed a Sort (the
    global-window funnel shape: Window <- Sort <- Exchange SinglePartition).
    Scalar count(1) aggregates also plan a SinglePartition exchange —
    1-row, legitimate — so a bare substring assert would false-positive
    on every corpus-N broadcast."""
    lines = plan.splitlines()
    hits = 0
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        above = " ".join(lines[max(0, i - 2):i])
        if "Sort [" in above:
            hits += 1
    return hits


def test_rrf_neighborhood_no_global_window(spark, sf_dir):
    """VERDICT r06 #3: the scale variant of the RRF ensemble ranks per
    doc-neighborhood — its plan must contain NO single-partition window
    sort, where the gated global twin (kept as the oracle anchor)
    deliberately contains two.  The global plan doubles as a positive
    control that the detector actually sees the funnel shape."""
    neigh = _plan(spark, sf_dir, "llm_rrf_neighborhood")
    assert _single_partition_window_sorts(neigh) == 0
    glob = _plan(spark, sf_dir, "llm_rrf_ensemble")
    assert _single_partition_window_sorts(glob) >= 2


@pytest.mark.parametrize(
    "name",
    [
        "llm_jaccard_prefix_join",
        "llm_containment",
        "llm_graph_triangles",
        "llm_bm25_topk",
        "llm_bigram_surprisal",
        "llm_dsir_importance",
        "llm_dedup_keepers_quality",
        "llm_graph_triangles_degree",
        "llm_pq_recall_residual",
        "llm_ccnet_buckets",
        "llm_semdedup_pairs",
        "llm_semdedup_bcast",
        "llm_pq_recall_opq",
        "llm_ccnet_assign",
        "llm_ivfpq_residual_bcast",
        "rl_returned_item_ranking",
        "rl_top_supplier_revenue",
        "rl_large_volume_orders",
        "llm_ngram_novelty",
        "llm_packing_waste",
        "rl_global_sales_opportunity",
        "rl_nation_trade_volume",
        "rl_market_share",
        "llm_ivfpq_residual_ann",
        "rl_rfm_segments",
        "llm_sq8_error",
        "llm_gopher_filters",
        "rl_min_cost_supplier",
        "rl_excess_stock_suppliers",
        "rl_forecast_revenue_change",
        "rl_product_type_profit",
        "rl_parts_supplier_counts",
        "rl_important_stock",
        "llm_temperature_mixture_t25",
        "llm_mmr_topk_ann",
        "llm_ivfpq_rank_eval",
        "llm_ivf_2level_ann",
        "rl_shipping_priority_mix",
        "llm_2level_rank_eval",
    ],
)
def test_round7_family_no_quadratic_join(spark, sf_dir, name):
    """Every round-7/8 similarity/graph/retrieval/selection gate must plan
    pure equi-joins — a CartesianProduct, or a BroadcastNestedLoopJoin
    beyond the sanctioned model-size broadcasts (the N/AL and V count
    frames in BM25/surprisal — 1 row; ccnet's 3-row tertile frame probed
    by a non-equi rank predicate, twice because both surprisal arms carry
    the V broadcast), means a blocking/probe stage silently degenerated
    to all-pairs."""
    plan = _strip_cached_subtrees(_plan(spark, sf_dir, name))
    assert "CartesianProduct" not in plan
    bnlj = plan.count("BroadcastNestedLoopJoin")
    # Budgets are LIVE node counts (cached subtrees stripped above, so
    # the numbers no longer float with session cache state).
    allowed = {
        "llm_bm25_topk": 1,
        "llm_bigram_surprisal": 1,
        # ccnet: the V 1-row broadcast in each surprisal arm + the 3-row
        # tertile frame probed by a non-equi rank predicate
        "llm_ccnet_buckets": 3,
        # Q22's 1-row positive-balance threshold broadcast
        "rl_global_sales_opportunity": 1,
        # the packed-centroid 1-row broadcast (k > 16 literal max), one
        # live node per self-join side of the persisted cell frame
        "llm_semdedup_pairs": 2,
        # same packed-centroid 1-row broadcast shape, DataFrame carrier
        "llm_semdedup_bcast": 2,
        # the surprisal V 1-row broadcast inside the scored frame
        "llm_ccnet_assign": 1,
        # the packed-centroid 1-row broadcast of the coarse assignment
        "llm_ivfpq_residual_bcast": 1,
        # Q11's 1-row (total, n) broadcast back over the aggregate frame
        "rl_important_stock": 1,
        # the single-row integer-totals broadcast (same as the τ=1/2 twin)
        "llm_temperature_mixture_t25": 1,
        # the packed-supers 1-row broadcast rides the descent twice in the
        # live plan (corpus super-assign + the centroid frame feeding the
        # leaf arrays; the persisted cells subtree is stripped)
        "llm_ivf_2level_ann": 2,
    }
    assert bnlj <= allowed.get(name, 0), f"{name}: {bnlj} live BNLJ nodes"


@pytest.mark.parametrize("name", ["llm_semdedup_capped", "llm_semdedup_2level"])
def test_semdedup_scale_twins_fresh_plan_no_quadratic(spark, sf_dir, name):
    """The capped/two-level semdedup twins, asserted on a FRESH-cache
    plan: warm session state re-embeds previously-persisted subtrees'
    build plans (including their sanctioned packed-broadcast 1-row
    joins) outside any strippable InMemoryRelation, so a warm-plan
    substring count floats with test order — the same plan-text hazard
    class as the r09 metadata-truncation flake.  Clearing the cache
    first makes the count deterministic: in a fresh plan every packed
    join sits inside its persisted subtree and the LIVE count is 0."""
    from data_engineering_project_utn_spark.persist import release_persisted

    release_persisted()
    spark.catalog.clearCache()
    plan = _strip_cached_subtrees(_plan(spark, sf_dir, name))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 0


def test_stratified_exact_no_global_sort(spark, sf_dir):
    """The exact-quota sampler's rank window partitions by stratum —
    never an Exchange SinglePartition funnel."""
    plan = _plan(spark, sf_dir, "llm_stratified_exact")
    assert _single_partition_window_sorts(plan) == 0


def test_bracket_revenue_pushes_disjunction_hulls(spark, sf_dir):
    """Q19 shape: each side's hull of the cross-table disjunction must
    reach its own scan — the brand/size branches into the part scan, the
    quantity brackets into the lineitem scan — and both scans stay
    column-pruned.  A scan reading every brand for a 3-brand query is
    the regression this catches."""
    plan = _plan(spark, sf_dir, "rl_bracket_revenue")
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    part_scan = next(ln for ln in scans if "p_brand" in ln)
    li_scan = next(ln for ln in scans if "l_quantity" in ln)
    assert "Brand#12" in part_scan, "brand disjunction hull not pushed"
    assert "l_quantity" in _pushed_filters(li_scan) or (
        "l_quantity" in li_scan.split("DataFilters", 1)[-1].split("ReadSchema", 1)[0]
    ), "quantity hull not pushed"
    for ln, nmax in ((part_scan, 4), (li_scan, 5)):
        cols = ln.split("[", 1)[1].split("]", 1)[0].split(",")
        assert len(cols) <= nmax, cols


def test_ccnet_assign_no_rank_window(spark, sf_dir):
    """The ccnet DEPLOYED path (VERDICT r08 #5): boundary estimates are
    collected during the build (model-size), so the RETURNED plan must
    carry NO Window node at all — the per-language rank window that puts
    each language in one partition belongs to the exact anchor arm
    (llm_ccnet_buckets) only.  Cached subtrees stripped so a warm
    persisted scored frame can't reprint its build plan into the
    assertion."""
    plan = _strip_cached_subtrees(_plan(spark, sf_dir, "llm_ccnet_assign"))
    assert "Window" not in plan
    assert _single_partition_window_sorts(plan) == 0
    assert "CartesianProduct" not in plan


def test_min_cost_supplier_window_min_is_distributed(spark, sf_dir):
    """Q2 shape: the correlated per-part MIN must ride a window
    partitioned by partkey (distributed) with every dim broadcast — a
    SinglePartition window, a nested loop, or a shuffled dim join here
    becomes the bottleneck on a 100 TB fact."""
    plan = _plan(spark, sf_dir, "rl_min_cost_supplier")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert _single_partition_window_sorts(plan) == 0


def test_excess_stock_semi_join_shrinks_fact_first(spark, sf_dir):
    """Q20 shape: the name-prefix part set must reach the lineitem side
    as a broadcast LEFT-SEMI *before* the (partkey, suppkey) aggregation
    — the fact shrinks before the only wide exchange — and the supplier
    probe is likewise semi-join, never an inner join that would duplicate
    supplier rows per excess part."""
    plan = _plan(spark, sf_dir, "rl_excess_stock_suppliers")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("LeftSemi") >= 2, "expected two semi-join stages"
    assert _single_partition_window_sorts(plan) == 0


def test_forecast_revenue_is_map_only_pushed_scan(spark, sf_dir):
    """Q6 shape: every conjunct reaches the lineitem scan's pushed
    filters and the scan reads only the 4 needed columns — the pure
    predicate-pushdown benchmark.  No join, no wide shuffle."""
    plan = _plan(spark, sf_dir, "rl_forecast_revenue_change")
    assert "Join" not in plan
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    li_scan = next(ln for ln in scans if "l_discount" in ln)
    pushed = _pushed_filters(li_scan)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed to scan"
    cols = li_scan.split("[", 1)[1].split("]", 1)[0].split(",")
    assert len(cols) <= 4, cols


def test_product_type_profit_broadcasts_all_dims(spark, sf_dir):
    """Q9 shape: part/supplier/nation broadcast; the only shuffle join
    is lineitem⋈orders on the fact's natural key; the name-substring
    part filter must prune the part scan before the broadcast."""
    plan = _plan(spark, sf_dir, "rl_product_type_profit")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 3
    assert "ring" in plan, "part name filter not visible in plan"


def test_parts_supplier_counts_anti_join_broadcast(spark, sf_dir):
    """Q16 shape: the excluded-supplier set rides a broadcast LEFT-ANTI
    (never a shuffled anti join or a nested loop), and the IN-list size
    filter reaches the part scan."""
    plan = _plan(spark, sf_dir, "rl_parts_supplier_counts")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan


def test_rfm_segments_no_single_partition(spark, sf_dir):
    """The three RFM quartile ranks must ride the distributed
    range-partition rank machinery — a global-window row_number would
    plan an Exchange SinglePartition funnel (the one-reducer bottleneck
    the ccnet exact arm deliberately keeps; this gate must NOT)."""
    plan = _plan(spark, sf_dir, "rl_rfm_segments")
    assert _single_partition_window_sorts(plan) == 0
    assert "CartesianProduct" not in plan


# Every TPC-H query shape, one uniform hygiene gate (VERDICT r10 #6): the
# per-shape tests above pin shape-specific structure (Q2 window-min, Q20
# semi-first, Q6 pushed scan, Q9 broadcast dims); this sweep pins the
# invariants EVERY shape must hold so a plan regression in any of the 22
# can't land silently.
_TPCH_SHAPES = {
    # name -> (allowed live BNLJ nodes, expected pushed-filter literals
    #          as (scan column marker, pushed column) pairs)
    "rl_pricing_summary": (0, []),                       # Q1
    "rl_min_cost_supplier": (0, []),                     # Q2
    "rl_top_revenue_orders": (0, []),                    # Q3
    "rl_order_priority_counts": (0, []),                 # Q4
    "rl_nation_revenue": (0, []),                        # Q5
    "rl_forecast_revenue_change": (0, [("l_discount", "l_shipdate")]),  # Q6
    "rl_nation_trade_volume": (0, []),                   # Q7
    "rl_market_share": (1, []),                          # Q8: 1-row total bcast
    "rl_product_type_profit": (0, []),                   # Q9
    "rl_returned_item_ranking": (0, []),                 # Q10
    "rl_important_stock": (1, []),                       # Q11: 1-row (total, n)
    "rl_shipping_priority_mix": (0, [("l_returnflag", "l_shipdate")]),  # Q12
    "rl_order_count_distribution": (0, []),              # Q13
    "rl_promo_revenue": (0, [("l_extendedprice", "l_shipdate")]),  # Q14
    "rl_top_supplier_revenue": (1, []),                  # Q15: 1-row max bcast
    "rl_parts_supplier_counts": (0, []),                 # Q16
    "rl_small_quantity_revenue": (0, []),                # Q17
    "rl_large_volume_orders": (0, []),                   # Q18
    "rl_bracket_revenue": (0, []),                       # Q19
    "rl_excess_stock_suppliers": (0, []),                # Q20
    "rl_sole_late_supplier": (0, []),                    # Q21
    "rl_global_sales_opportunity": (1, []),              # Q22: 1-row threshold
    "rl_product_type_profit_bucketed": (0, []),          # Q9 at-rest twin
}


@pytest.mark.parametrize("name", sorted(_TPCH_SHAPES))
def test_tpch_shape_plan_hygiene(spark, sf_dir, name):
    """Uniform invariants for every TPC-H shape: no cartesian product, no
    BroadcastNestedLoopJoin beyond the shape's sanctioned 1-row-total
    broadcasts, no global-window funnel (Exchange SinglePartition feeding
    a Sort), and the shape's fact date-window literals pushed into the
    fact scan where declared."""
    bnlj_budget, pushed_pairs = _TPCH_SHAPES[name]
    plan = _strip_cached_subtrees(_plan(spark, sf_dir, name))
    assert "CartesianProduct" not in plan, name
    bnlj = plan.count("BroadcastNestedLoopJoin")
    assert bnlj <= bnlj_budget, f"{name}: {bnlj} live BNLJ nodes"
    assert _single_partition_window_sorts(plan) == 0, name
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    for marker, pushed_col in pushed_pairs:
        scan = next(ln for ln in scans if marker in ln)
        meta = _pushed_filters(scan)
        assert pushed_col in meta, f"{name}: {pushed_col} not pushed"


def test_incremental_snm_no_single_partition_no_bnl(spark, sf_dir):
    """The incremental merge/purge arm's scale contract: every ranking
    goes through the distributed with_global_rank machinery (no
    SinglePartition window), the insertion probe is equi-join only (no
    BroadcastNestedLoop/cartesian), and nothing corpus-scale rides a
    static-estimate broadcast."""
    plan = _plan(spark, sf_dir, "llm_incremental_snm")
    assert "SinglePartition" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan
    for s in _broadcast_subtrees(plan):
        lines = s.splitlines()
        cut = next(
            (i for i, ln in enumerate(lines)
             if "InMemoryTableScan" in ln or "ExistingRDD" in ln),
            None,
        )
        assert cut is not None, s
        assert "FileScan" not in "\n".join(lines[:cut]), s
