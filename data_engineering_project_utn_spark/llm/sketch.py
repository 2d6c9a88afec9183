"""Mergeable sketches for petabyte-scale approximate aggregation.

Count-min (Cormode-Muthukrishnan): D hash rows of W counters.  In
DataFrame terms the sketch IS a grouped aggregation on (d, hash_d(item) %
W) — partial aggregation map-side is exactly the sketch-merge property,
so counters never exceed D·W rows (model-size) no matter the corpus, and
two corpora's sketches merge by summing counters.  Estimates are
min-over-rows and can only OVERcount (≤ true + εN with ε ≈ e/W at
standard depth) — the documented swap for exact heavy-hitter counts at
scans where a full groupBy's key space is the bottleneck (SCALE.md).

HyperLogLog (Flajolet et al.): m registers, each the max leading-zero
rank ρ of the items hashing into it.  Here the register frame is a
grouped MAX on (first-hex-chars bucket, ρ from the md5 tail) — partial
MAX map-side is the sketch merge, registers never exceed m rows, two
corpora merge by per-register max.  The estimator numerator
Σ 2^(R−M_j) is accumulated as exact integers in decimal (R = 61 caps ρ
at the 60 hash bits used), so the whole estimate is a deterministic
function of the register values — cross-engine bit-reproducible, unlike
library HLLs whose float harmonic sums are fold-order-dependent.

Hashing is md5-derived (seeded by row index), so every sketch here —
build, merge, estimate, error — is reproducible in SQL oracles via the
same hex-char fold the SimHash gate uses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cm_hash(item: Column, seed: int, width: int) -> Column:
    """Row-``seed`` bucket for ``item``: first 8 md5 hex chars as an int,
    mod ``width`` — deterministic, engine-reproducible."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{seed}:"), item)), 1, 8), 16, 10
        ).cast("long")
        % width
    )


def cm_counters(
    items: DataFrame, item_col: str, depth: int = 3, width: int = 512
) -> DataFrame:
    """Build the sketch: (d, bucket, cnt) counters, ≤ depth·width rows."""
    c = F.col(item_col)
    rows = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), cm_hash(c, d, width).alias("bucket")
                    )
                    for d in range(depth)
                ]
            )
        ).alias("s")
    ).select("s.d", "s.bucket")
    return rows.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cm_estimates(
    counters: DataFrame,
    queries: DataFrame,
    item_col: str,
    depth: int = 3,
    width: int = 512,
) -> DataFrame:
    """Point estimates for the query items: min over the D counters each
    item hashes to.  ``counters`` is model-size → broadcast join.

    The join is LEFT with ``coalesce(cnt, 0)``: canonical count-min reads
    an empty bucket as 0, so an item absent from the corpus estimates 0
    instead of disappearing (or worse, taking an inflated min over only
    its populated buckets)."""
    c = F.col(item_col)
    q = queries.select(
        item_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), cm_hash(c, d, width).alias("bucket")
                    )
                    for d in range(depth)
                ]
            )
        ).alias("s"),
    ).select(item_col, "s.d", "s.bucket")
    return (
        q.join(F.broadcast(counters), ["d", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cm_estimate"))
    )


def cm_merge(*counter_frames: DataFrame) -> DataFrame:
    """Merge sketches built with identical (depth, width, seeds): counters
    sum per (d, bucket).  This is the union-then-groupBy spelling of the
    same merge the map-side partial aggregation performs inside one build —
    merged(A) ⊎ merged(B) ≡ sketch(A ∪ B) exactly, which is what makes the
    sketch shard-parallel at any scale (per-shard sketches, model-size
    merge; the cross-engine gate ``llm_cm_extract`` proves it bit-exactly
    against a single-pass oracle sketch)."""
    from functools import reduce

    u = reduce(lambda a, b: a.unionByName(b), counter_frames)
    return u.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def cm_heavy_hitters(
    counters: DataFrame,
    candidates: DataFrame,
    item_col: str,
    epsilon: float,
    depth: int = 3,
    width: int = 512,
) -> DataFrame:
    """Heavy-hitter extraction: candidates whose estimate ≥ ε·N, with N
    (the stream length) read from the sketch itself — row 0's counters sum
    to N, so no second pass over the data.  One-sided: every item with
    true count ≥ ε·N is guaranteed in the output (CM never undercounts);
    false positives are bounded by the e/W overcount.  ``candidates`` is
    the item domain to probe (CM is not invertible — at scale keep the
    candidate set alongside the sketch, e.g. per-shard local top-k).

    Output: item, cm_estimate, threshold (ε·N as double — use an exactly
    representable ε like 1/256 for cross-engine bit-parity)."""
    n_total = counters.filter(F.col("d") == 0).agg(F.sum("cnt").alias("_n"))
    est = cm_estimates(counters, candidates, item_col, depth, width)
    thresh = F.lit(epsilon) * F.col("_n").cast("double")
    return (
        est.crossJoin(F.broadcast(n_total))
        .filter(F.col("cm_estimate").cast("double") >= thresh)
        .select(item_col, "cm_estimate", thresh.alias("threshold"))
    )


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

# ρ is computed from 60 md5 tail bits (hex chars 3..17); an all-zero tail
# caps at 61 (= 60 zero bits + 1), so 2^(CAP − ρ) always fits a BIGINT.
HLL_RHO_CAP = 61

_HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def hll_alpha(m: int) -> float:
    """Standard HLL bias constant (Flajolet et al. 2007)."""
    return _HLL_ALPHA.get(m, 0.7213 / (1 + 1.079 / m))


def _hll_rho(item: Column) -> Column:
    """Leading-zero rank of the 60-bit md5 tail, via string ops that DuckDB
    mirrors verbatim (regexp strip of leading '0' chars + a 16-way CASE for
    the partial zeros inside the first nonzero hex char)."""
    tail = F.substring(F.md5(item), 3, 15)
    stripped = F.regexp_replace(tail, "^0+", "")
    nz4 = (F.lit(15) - F.length(stripped)) * 4  # whole zero hex chars, in bits
    first = F.substring(stripped, 1, 1)
    partial = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    return F.when(F.length(stripped) == 0, F.lit(HLL_RHO_CAP)).otherwise(
        nz4 + partial + 1
    )


def hll_registers(items: DataFrame, item_col: str, b: int = 6) -> DataFrame:
    """Build the register frame: (bucket, M) with M = max ρ per bucket —
    ≤ 2^b rows at any corpus size; the grouped MAX's map-side partial agg
    IS the sketch merge.  Bucket = first two md5 hex chars mod m (256 is a
    multiple of every m ≤ 256, so the fold stays uniform)."""
    m = 1 << b
    c = F.col(item_col)
    h = F.md5(c)
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("long") % m
    return (
        items.select(bucket.alias("bucket"), _hll_rho(c).alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("M"))
    )


def hll_merge(*register_frames: DataFrame) -> DataFrame:
    """Merge register frames built with the same b: per-register max —
    hll(A) ⊔ hll(B) ≡ hll(A ∪ B) exactly (max is idempotent/commutative,
    so the merge also absorbs replays for free)."""
    from functools import reduce

    u = reduce(lambda a, b: a.unionByName(b), register_frames)
    return u.groupBy("bucket").agg(F.max("M").alias("M"))


def hll_estimate(registers: DataFrame, b: int = 6) -> DataFrame:
    """Single-row cardinality estimate from a register frame.

    Every accumulation is exact: the harmonic-mean numerator
    Σ_j 2^(CAP − M_j) is a sum of BIGINT powers of two in DECIMAL(38,0)
    (order-independent — library HLLs sum 2^−M as doubles, which is
    fold-order-dependent and therefore not reproducible), and empty
    registers enter as M = 0 via a left join against the full 0..m−1
    domain.  The only floating steps are the final constant-folded
    multiply/divide chain (same literals, same left-assoc order in the
    SQL oracle) and — on the small-range branch only — one ``ln`` whose
    cross-engine ULP risk is absorbed by rounding the estimate to a
    BIGINT.  Output: hll_estimate, n_empty_registers, numerator."""
    m = 1 << b
    spark = registers.sparkSession
    domain = spark.range(m).select(F.col("id").cast("long").alias("bucket"))
    full = domain.join(registers, "bucket", "left").select(
        F.coalesce(F.col("M"), F.lit(0)).alias("M")
    )
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RHO_CAP} - M)")
    agg = full.agg(
        F.sum(term.cast("decimal(38,0)")).alias("numerator"),
        F.sum((F.col("M") == 0).cast("long")).alias("n_empty_registers"),
    )
    e_raw = (
        F.lit(hll_alpha(m))
        * F.lit(float(m))
        * F.lit(float(m))
        * F.lit(float(1 << HLL_RHO_CAP))
        / F.col("numerator").cast("double")
    )
    small = (e_raw <= F.lit(2.5 * m)) & (F.col("n_empty_registers") > 0)
    linear = F.lit(float(m)) * F.log(
        F.lit(float(m)) / F.col("n_empty_registers").cast("double")
    )
    est = F.when(small, linear).otherwise(e_raw)
    return agg.select(
        F.round(est).cast("bigint").alias("hll_estimate"),
        "n_empty_registers",
        "numerator",
    )


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def bloom_hash(item: Column, seed: int, m: int) -> Column:
    """Bit position ``seed`` for ``item``: first 8 md5 hex chars of the
    seeded digest as an int, mod ``m`` — the same engine-reproducible fold
    as ``cm_hash`` with a distinct ``bf`` prefix so the two sketches'
    hash families are decorrelated."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"bf{seed}:"), item)), 1, 8), 16, 10
        ).cast("long")
        % m
    )


def bloom_bits(items: DataFrame, item_col: str, m: int = 4096, k: int = 3) -> DataFrame:
    """Build the filter: the DISTINCT set-bit positions — ≤ m rows at any
    input size (model-size, broadcastable).  The distinct's map-side
    partial dedup IS the sketch merge, and two filters built with the same
    (m, k) merge by plain union+distinct: bits(A) ∪ bits(B) ≡ bits(A ∪ B),
    the union-property Bloom filters are used for at scale (per-shard
    build, model-size OR-merge)."""
    c = F.col(item_col)
    return (
        items.select(
            F.explode(F.array(*[bloom_hash(c, s, m) for s in range(k)])).alias("bit")
        )
        .distinct()
    )


def bloom_merge(*bit_frames: DataFrame) -> DataFrame:
    """OR-merge filters built with identical (m, k): union + distinct."""
    from functools import reduce

    return reduce(lambda a, b: a.unionByName(b), bit_frames).distinct()


def bloom_contains(
    bits: DataFrame, candidates: DataFrame, item_col: str, m: int = 4096, k: int = 3
) -> DataFrame:
    """Membership probe: (item, maybe_present) — true iff ALL k of the
    item's bit positions are set.  One-sided like every Bloom filter: a
    member always probes true (no false negatives); a non-member probes
    true with probability ≈ (1 − e^(−kn/m))^k.  The bit frame broadcasts
    (≤ m rows), so the probe side is a narrow scan + one broadcast
    left-join + a doc-key aggregation — the corpus never shuffles on
    anything but its own id.  All of ``candidates``' columns are carried
    through and grouped on, so composite keys (e.g. (doc_id, shingle))
    probe row-for-row."""
    c = F.col(item_col)
    keys = list(candidates.columns)
    probes = candidates.select(
        *keys,
        F.explode(F.array(*[bloom_hash(c, s, m) for s in range(k)])).alias("bit"),
    )
    marked = probes.join(
        F.broadcast(bits.withColumn("_set", F.lit(1))), "bit", "left"
    )
    return marked.groupBy(*keys).agg(
        (F.min(F.coalesce(F.col("_set"), F.lit(0))) == 1).alias("maybe_present")
    )


def hll_registers_grouped(
    items: DataFrame, item_col: str, group_cols: list[str], b: int = 6
) -> DataFrame:
    """Per-GROUP register frames: (group..., bucket, M) — ≤ m rows per
    group at any size; one grouped MAX whose map-side partial agg is the
    per-group sketch merge.  This is the 100 TB profiling shape: distinct
    cardinality per domain/source/language in one scan, sketch state
    m·|groups| rows total."""
    m = 1 << b
    c = F.col(item_col)
    bucket = F.conv(F.substring(F.md5(c), 1, 2), 16, 10).cast("long") % m
    return (
        items.select(*group_cols, bucket.alias("bucket"), _hll_rho(c).alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("M"))
    )


def hll_estimate_grouped(
    registers: DataFrame, group_cols: list[str], b: int = 6
) -> DataFrame:
    """Per-group cardinality estimates from a grouped register frame —
    same exact-decimal numerator and linear-counting small-range branch as
    ``hll_estimate``.  Empty registers are completed ARITHMETICALLY
    instead of via a domain join: a present bucket always has M = ρ ≥ 1,
    so every absent bucket contributes exactly 2^CAP to the numerator and
    1 to n_empty — one groupBy, no self-join (which also keeps the frame
    usable on streaming-sink tables, where a registers→registers join
    trips attribute dedup).  Output: (group..., hll_estimate,
    n_empty_registers, numerator)."""
    m = 1 << b
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RHO_CAP} - M)")
    cap_term = F.lit(1 << HLL_RHO_CAP).cast("decimal(38,0)")
    agg = registers.groupBy(*group_cols).agg(
        (
            F.sum(term.cast("decimal(38,0)"))
            + (F.lit(m) - F.count(F.lit(1))).cast("decimal(38,0)") * cap_term
        ).alias("numerator"),
        (F.lit(m) - F.count(F.lit(1))).cast("long").alias("n_empty_registers"),
    )
    e_raw = (
        F.lit(hll_alpha(m))
        * F.lit(float(m))
        * F.lit(float(m))
        * F.lit(float(1 << HLL_RHO_CAP))
        / F.col("numerator").cast("double")
    )
    small = (e_raw <= F.lit(2.5 * m)) & (F.col("n_empty_registers") > 0)
    linear = F.lit(float(m)) * F.log(
        F.lit(float(m)) / F.col("n_empty_registers").cast("double")
    )
    est = F.when(small, linear).otherwise(e_raw)
    return agg.select(
        *group_cols,
        F.round(est).cast("bigint").alias("hll_estimate"),
        "n_empty_registers",
        "numerator",
    )


def cm_counters_grouped(
    items: DataFrame,
    item_col: str,
    group_cols: list[str],
    depth: int = 3,
    width: int = 512,
) -> DataFrame:
    """Per-GROUP count-min sketches in one scan: (group..., d, bucket,
    cnt), ≤ depth·width rows per group — the grouped twin of
    ``cm_counters`` (same seeded buckets, so a group's slice IS the
    sketch ``cm_counters`` would build on that group's rows alone)."""
    c = F.col(item_col)
    rows = items.select(
        *group_cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), cm_hash(c, d, width).alias("bucket")
                    )
                    for d in range(depth)
                ]
            )
        ).alias("s"),
    ).select(*group_cols, "s.d", "s.bucket")
    return rows.groupBy(*group_cols, "d", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cm_estimates_grouped(
    counters: DataFrame,
    queries: DataFrame,
    item_col: str,
    group_cols: list[str],
    depth: int = 3,
    width: int = 512,
) -> DataFrame:
    """Point estimates per (group, item): min over the D counters within
    the item's group, empty buckets reading 0 (left join + coalesce, as in
    ``cm_estimates``).  ``queries`` must carry the group columns."""
    c = F.col(item_col)
    q = queries.select(
        *group_cols,
        item_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), cm_hash(c, d, width).alias("bucket")
                    )
                    for d in range(depth)
                ]
            )
        ).alias("s"),
    ).select(*group_cols, item_col, "s.d", "s.bucket")
    return (
        q.join(F.broadcast(counters), [*group_cols, "d", "bucket"], "left")
        .groupBy(*group_cols, item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cm_estimate"))
    )


def bottomk_sample(items: DataFrame, key_col: str, k: int = 256) -> DataFrame:
    """Deterministic bounded uniform sample: the k rows with the SMALLEST
    md5(key) — the classic hash-threshold (KMV / bottom-k) sample behind
    mergeable quantile and distinct sketches.  Properties that make it a
    sketch rather than a sample:

    * bounded: ≤ k rows at any input size,
    * deterministic: no RNG state, same rows at any partitioning,
    * MERGEABLE: bottomk(A ∪ B) ≡ bottomk(bottomk(A) ∪ bottomk(B)) —
      per-shard samples union and re-trim exactly (tested), so a fleet of
      shard samples composes to the global sample,
    * uniform: md5 is uniform on the key domain, so the k survivors are a
      uniform k-subset — order statistics over them estimate quantiles
      with standard sampling error.

    CONTRACT: ``key_col`` values must be UNIQUE (they are doc_id at every
    call site).  The sort key is md5(key) alone, so duplicate key values
    hash identically and which of their rows survive the limit(k) trim
    would be partitioning-dependent — breaking both the determinism claim
    and the exact shard-merge re-trim (ADVICE r06 #1).  For a multiset,
    pre-aggregate to unique keys (carry a count) or sample a unique
    surrogate key instead.

    Plan shape: TakeOrdered on the hash (per-partition heap + k·P driver
    merge), never a global sort."""
    c = F.col(key_col).cast("string")
    return (
        items.withColumn("_h", F.md5(c)).orderBy("_h").limit(k).drop("_h")
    )


def bottomk_sample_grouped(
    items: DataFrame, key_col: str, group_cols: list[str], k: int = 256
) -> DataFrame:
    """Per-GROUP bottom-k samples in one pass: the k smallest md5(key)
    rows within each group — ≤ k rows per group at any size, same merge
    identity as ``bottomk_sample`` per group.  One shuffle on the group
    key (rank window partitioned by group — never a global sort).
    Same contract as ``bottomk_sample``: ``key_col`` must be unique
    within each group (ADVICE r06 #1)."""
    from pyspark.sql import Window

    c = F.col(key_col).cast("string")
    w = Window.partitionBy(*group_cols).orderBy(F.md5(c))
    return (
        items.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .drop("_r")
    )
