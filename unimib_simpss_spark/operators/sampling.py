"""Deterministic, key-hashed sampling and dataset splitting.

A 100 TB training-data pipeline cannot use ``df.sample()`` for
train/val/test splits: RNG sampling is nondeterministic across retries,
repartitions, and reruns, so a failed stage re-executes with different
rows and the split silently leaks. The reproducible formulation hashes a
stable key column — membership is a pure function of the key, identical
on every rerun, every engine, and every subset of the data (adding new
rows never moves old rows between splits — the property that keeps
incremental ingestion append-only).

Built on the portable 60-bit md5 hash (`functions/hashing.py`), so the
assignment is verifiable bit-for-bit against the DuckDB oracle; swap in
``xxhash64`` for production where cross-engine parity isn't needed.

Per-row, no shuffle, whole-stage codegen — embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from unimib_simpss_spark.functions.hashing import hash64, hash64_sql


def split_assignment(
    key: Column | str, fractions: dict[str, float], buckets: int = 100
) -> Column:
    """Split-label column: key-hash bucketed into ``fractions``.

    ``fractions`` maps label -> fraction (must sum to 1.0); assignment is
    ``hash(key) % buckets`` walked through the cumulative ranges.
    """
    _check_fractions(fractions, buckets)
    h = hash64(F.col(key).cast("string") if isinstance(key, str) else key.cast("string"))
    b = h % buckets
    expr = None
    hi = 0.0
    items = list(fractions.items())
    for label, frac in items[:-1]:
        hi += frac
        cond = b < int(round(hi * buckets))
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    last_label = items[-1][0]
    return (expr.otherwise(last_label) if expr is not None else F.lit(last_label)).alias(
        "split"
    )


def split_assignment_sql(
    key_expr: str, fractions: dict[str, float], buckets: int = 100
) -> str:
    """DuckDB SQL text twin of :func:`split_assignment`."""
    _check_fractions(fractions, buckets)
    b = f"({hash64_sql(f'CAST({key_expr} AS VARCHAR)')} % {buckets})"
    items = list(fractions.items())
    parts = []
    hi = 0.0
    for label, frac in items[:-1]:
        hi += frac
        parts.append(f"WHEN {b} < {int(round(hi * buckets))} THEN '{label}'")
    return "CASE " + " ".join(parts) + f" ELSE '{items[-1][0]}' END"


def hash_split(df: DataFrame, key: str, fractions: dict[str, float]) -> DataFrame:
    """Tag ``df`` with a deterministic ``split`` column."""
    return df.withColumn("split", split_assignment(key, fractions))


def deterministic_sample(df: DataFrame, key: str, fraction: float) -> DataFrame:
    """Keep a stable ``fraction`` of rows, selected purely by key hash."""
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    buckets = 10_000
    h = hash64(F.col(key).cast("string"))
    return df.where((h % buckets) < int(round(fraction * buckets)))


def mix_keep(
    group_col: str,
    key: str,
    fractions: dict[str, float],
    default_fraction: float = 1.0,
    buckets: int = 10_000,
) -> Column:
    """Boolean keep-flag implementing a deterministic corpus mix: each
    ``group_col`` value is down-sampled to its fraction (the LLaMA/Pile
    data-mixing step — per-source sampling weights applied before
    training). Membership is a pure function of ``hash(key)``, so the
    mix is identical on every rerun/engine and append-stable; groups not
    listed keep ``default_fraction``.

    Per-row, no shuffle — composes with any downstream plan."""
    for g, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {g!r} must be in [0, 1], got {frac}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0, 1], got {default_fraction}")
    h = hash64(F.col(key).cast("string")) % buckets
    thr: Column | None = None
    for g, frac in fractions.items():
        t = int(round(frac * buckets))
        cond = F.col(group_col) == g
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    default_t = int(round(default_fraction * buckets))
    thr_col = thr.otherwise(default_t) if thr is not None else F.lit(default_t)
    return h < thr_col


def mix_keep_sql(
    group_expr: str,
    key_expr: str,
    fractions: dict[str, float],
    default_fraction: float = 1.0,
    buckets: int = 10_000,
) -> str:
    """DuckDB SQL text twin of :func:`mix_keep`."""
    h = f"({hash64_sql(f'CAST({key_expr} AS VARCHAR)')} % {buckets})"
    whens = " ".join(
        f"WHEN '{g}' THEN {int(round(frac * buckets))}"
        for g, frac in fractions.items()
    )
    default_t = int(round(default_fraction * buckets))
    return f"({h} < CASE {group_expr} {whens} ELSE {default_t} END)"


def _replicate_parts(
    weights: dict[str, float],
    default_weight: float,
    buckets: int,
    max_copies: int,
) -> tuple[dict[str, tuple[int, int]], tuple[int, int]]:
    """Per-group (integer copies, fractional-copy hash threshold) pairs
    computed ONCE in Python — both engines interpolate the same ints,
    so copy counts are bit-identical by construction."""
    import math

    def part(g, w):
        if not (w == w and 0.0 <= w <= max_copies):
            raise ValueError(
                f"weight for {g!r} must be in [0, {max_copies}] "
                f"(max_copies guards against an accidental corpus "
                f"explosion), got {w}"
            )
        k = int(math.floor(w))
        return k, int(round((w - k) * buckets))

    return (
        {g: part(g, w) for g, w in weights.items()},
        part("default_weight", default_weight),
    )


def replicate_copies(
    group_col: str,
    key: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
    buckets: int = 10_000,
    max_copies: int = 1_000,
) -> Column:
    """Integer copy-count column implementing deterministic
    fractional-EPOCH up-sampling — the other half of the data-mixing
    story :func:`mix_keep` tells: a recipe weight of 2.5 epochs for a
    high-quality source (the LLaMA/Pile regime, where books/wiki
    repeat while web crawl is sub-sampled) means every doc appears
    ``floor(w)`` times plus one more with probability ``frac(w)``:

        n = floor(w) + [hash(key) % buckets < round(frac(w)·buckets)]

    The fractional copy rides the SAME hash space and threshold
    convention as :func:`mix_keep`, so a weight < 1 degenerates to
    exactly mix_keep's row set — down- and up-sampling compose on one
    deterministic membership function (rerun/engine/append-stable).
    Groups not listed get ``default_weight``; a weight of 0 drops the
    group. A NULL key has no hash and yields NULL copies — the row
    DROPS (``replicate_by_weight`` emits no replica; aggregates skip
    it), the same rule ``mix_keep`` applies, and the SQL twin pins the
    identical behavior (review r18 pass 5). ``max_copies`` bounds any
    single weight — at corpus scale a fat-fingered 10^6 here IS an
    outage, so it fails loudly at plan time, not in the shuffle."""
    parts, (dk, dthr) = _replicate_parts(
        weights, default_weight, buckets, max_copies
    )
    h = hash64(F.col(key).cast("string")) % buckets
    base: Column | None = None
    thr: Column | None = None
    for g, (k, t) in parts.items():
        cond = F.col(group_col) == g
        base = F.when(cond, k) if base is None else base.when(cond, k)
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    base_col = base.otherwise(dk) if base is not None else F.lit(dk)
    thr_col = thr.otherwise(dthr) if thr is not None else F.lit(dthr)
    return base_col + (h < thr_col).cast("int")


def replicate_copies_sql(
    group_expr: str,
    key_expr: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
    buckets: int = 10_000,
    max_copies: int = 1_000,
) -> str:
    """DuckDB SQL text twin of :func:`replicate_copies`."""
    parts, (dk, dthr) = _replicate_parts(
        weights, default_weight, buckets, max_copies
    )
    h = f"({hash64_sql(f'CAST({key_expr} AS VARCHAR)')} % {buckets})"
    if not parts:
        # no per-group weights: plain default literals — a zero-WHEN
        # CASE is a parse error, where the Column twin handles {} fine
        # (review r18 pass 2)
        body = f"({dk} + CASE WHEN {h} < {dthr} THEN 1 ELSE 0 END)"
    else:
        base = " ".join(
            f"WHEN '{g}' THEN {k}" for g, (k, _) in parts.items()
        )
        thr = " ".join(
            f"WHEN '{g}' THEN {t}" for g, (_, t) in parts.items()
        )
        body = (
            f"(CASE {group_expr} {base} ELSE {dk} END"
            f" + CASE WHEN {h} < CASE {group_expr} {thr} ELSE {dthr} END"
            f" THEN 1 ELSE 0 END)"
        )
    # NULL-key rule, pinned to match BOTH the Column twin and mix_keep:
    # a NULL key has no hash and produces NULL copies (the row drops —
    # sum() skips it, unnest(generate_series(1, NULL)) emits nothing).
    # Without this wrap the SQL's CASE WHEN NULL < thr THEN 1 ELSE 0
    # would emit floor(w) copies while Spark dropped the row — a silent
    # cross-engine fork (review r18 pass 5).
    return f"(CASE WHEN {key_expr} IS NULL THEN NULL ELSE {body} END)"


def replicate_by_weight(
    df: DataFrame,
    group_col: str,
    key: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
    buckets: int = 10_000,
    max_copies: int = 1_000,
    rep_col: str = "rep",
) -> DataFrame:
    """Materialize the up-sampled corpus: each row of ``df`` repeated
    :func:`replicate_copies` times, tagged ``rep_col`` = 1..n so
    replicas stay distinguishable downstream (e.g. ``(key, rep)`` as
    the packing key). Map-side explode of a bounded sequence — no
    shuffle, no driver state; output size is Σ w_g·|g|, plan-time
    bounded by ``max_copies``. Zero-copy rows vanish (the explode of
    an empty array), which is how a weight < 1 reproduces
    :func:`mix_keep` exactly. The sequence is built under a ``when``
    guard because Spark's ``sequence(1, 0)`` yields a DESCENDING
    [1, 0], not an empty array."""
    if rep_col in df.columns:
        # silent overwrite corrupts a previously-tagged corpus (the
        # stratified_split reserved-name rule, review r18 pass 2)
        raise ValueError(
            f"df already has a {rep_col!r} column — pass rep_col to "
            "pick a free name"
        )
    n = replicate_copies(
        group_col, key, weights, default_weight, buckets, max_copies
    )
    seq = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn(rep_col, F.explode(seq))


def pps_keep(
    weight_col: str,
    key: str,
    full_weight: int,
    buckets: int = 1_000_000,
) -> Column:
    """Boolean keep-flag implementing deterministic PPS (probability-
    proportional-to-size) Bernoulli sampling: row ``i`` is kept with
    probability ``min(1, weight_i / full_weight)`` — the size-biased
    sampling step of corpus curation (sample long/high-quality docs
    preferentially; Poisson-PPS survey sampling, Hansen-Hurwitz 1943
    estimator family).

    INTEGER-exact membership: keep iff
    ``(hash64(key) % buckets) * full_weight < weight * buckets`` —
    every quantity is a long, no float ratio ever materializes, so the
    decision is bit-identical across engines/reruns and append-stable
    (the same reasons as :func:`mix_keep`, which this generalizes from
    per-GROUP constant fractions to a per-ROW weight). Per-row, no
    shuffle. Weights must be non-negative; fractional weights are
    FLOORED before the comparison (identically in both engines — the
    membership stays integer-only); weight >= full_weight keeps the
    row always. Unbiased totals re-weight kept rows by
    ``max(1, full_weight/weight)`` (Horvitz-Thompson), which stays
    exact in the same integer space.
    """
    if full_weight <= 0:
        raise ValueError(f"full_weight must be positive, got {full_weight}")
    if full_weight > (2**63 - 1) // buckets:
        # h < buckets, so h*full_weight stays under 2^63 iff
        # full_weight*buckets does; past that the product wraps int64
        # (silently, with ANSI off) and keep decisions flip — including
        # in the certainty region
        raise ValueError(
            f"full_weight {full_weight} would overflow int64 at "
            f"buckets={buckets}; keep full_weight <= "
            f"{(2**63 - 1) // buckets}"
        )
    h = hash64(F.col(key).cast("string")) % buckets
    # floor-then-widen the weight: floor makes fractional weights
    # behave identically in both engines (Spark's bare long cast
    # truncates where DuckDB's rounds — a parity break), and the long
    # widening stops an IntegerType weight from overflowing 32-bit at
    # weight*buckets (silently, with ANSI off) and flipping keep
    # decisions in the certainty region. Clamp w to full_weight: any
    # w >= full_weight already keeps unconditionally (h < buckets ⇒
    # h*full_weight < buckets*full_weight <= w*buckets), so the clamp
    # preserves every decision while capping w*buckets at the same
    # overflow-checked bound as h*full_weight.
    w = F.least(
        F.floor(F.col(weight_col)).cast("long"), F.lit(full_weight)
    )
    return (h * F.lit(full_weight)) < (w * F.lit(buckets))


def pps_keep_sql(
    weight_expr: str,
    key_expr: str,
    full_weight: int,
    buckets: int = 1_000_000,
) -> str:
    """DuckDB SQL text twin of :func:`pps_keep` (same floor + clamp)."""
    h = f"({hash64_sql(f'CAST({key_expr} AS VARCHAR)')} % {buckets})"
    return (
        f"({h} * {full_weight} < "
        f"least(CAST(floor({weight_expr}) AS BIGINT), {full_weight})"
        f" * {buckets})"
    )


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    key: str,
    buckets: int = 1 << 60,
) -> DataFrame:
    """Deterministic fixed-SIZE weighted sampling without replacement
    (Efraimidis & Spirakis 2006, "Weighted random sampling with a
    reservoir"): keep the ``n`` rows with the largest
    ``ln(u_i) / w_i``, where ``u_i ∈ (0, 1]`` derives from the row's
    hash — each row's inclusion probability is proportional to its
    weight among competitors, and the draw is a pure function of
    ``hash(key)`` (rerun/append-stable, like every sampler here).

    The fixed-size complement of :func:`pps_keep` (which is Bernoulli:
    expected size only). Rows with NULL or non-positive weight are
    excluded. Plan: one narrow projection + global top-``n`` via
    ``TakeOrderedAndProject`` (per-partition heaps, no full sort) —
    ``n`` bounds the result by contract, the caller's sample size.

    No DuckDB oracle by design: the selector crosses ``ln`` (libm,
    not guaranteed identically rounded across engines), so this one is
    verified by property tests (size, determinism, weight bias,
    no-replacement) rather than a value-level hash compare — the same
    policy as the iterative/approximate x-queries.
    """
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    w = F.col(weight_col).cast("double")
    # NaN must be excluded explicitly: Spark orders NaN ABOVE every
    # number, so `NaN > 0` is true and a NaN ES-key would sort first
    # and hijack the whole sample
    return (
        df.where(w.isNotNull() & ~F.isnan(w) & (w > 0))
        .withColumn("_es", es_priority(weight_col, key, buckets))
        .orderBy(F.desc("_es"), F.col(key))
        .limit(n)
        .drop("_es")
    )


def es_priority(weight_col: str, key: str, buckets: int = 1 << 60) -> Column:
    """The Efraimidis-Spirakis selection priority ``ln(u)/w`` with
    ``u ∈ (0, 1]`` derived from ``hash64(key)`` — shared verbatim by
    :func:`weighted_sample` and the streaming reservoir
    (streaming/stateful.py streaming_reservoir), which is what makes
    their samples BIT-IDENTICAL on the same rows: the only float ops
    (``ln``, the division) run JVM-side in both, the stream merely
    maintains the running top-n of the same priorities.

    ``u > 0`` is guaranteed because :func:`hash64` is non-negative by
    construction (60-bit md5 prefix); pmod keeps that true even if the
    hash is ever swapped for a signed one (a signed ``%`` would send
    negative-hash rows through ``ln(u ≤ 0) = NULL`` and silently drop
    them from every sample)."""
    h = hash64(F.col(key).cast("string"))
    u = (F.pmod(h, F.lit(buckets)) + F.lit(1)).cast("double") / F.lit(
        float(buckets)
    )
    return F.log(u) / F.col(weight_col).cast("double")


def corpus_mix(
    df: DataFrame,
    group_col: str,
    key: str,
    fractions: dict[str, float],
    default_fraction: float = 1.0,
) -> DataFrame:
    """Apply :func:`mix_keep` as a filter — the production form."""
    return df.where(
        mix_keep(group_col, key, fractions, default_fraction=default_fraction)
    )


def greedy_pack(
    df: DataFrame,
    partition_col: str,
    order_col: str,
    token_col: str,
    budget: int,
) -> DataFrame:
    """Sequence packing (token-budget binning) for LLM training batches:
    concatenate documents in deterministic ``order_col`` order within
    each ``partition_col`` group and chunk the stream every ``budget``
    tokens — each row is tagged with the ``seq_bin`` its FIRST token
    lands in (concat-and-chunk assignment, the standard packing used to
    build fixed-length training sequences without padding waste).

    Distributed formulation: one window per partition key — packing is
    sequential BY DESIGN (bins depend on the running token total), so
    the parallel unit is the partition key, never a global sort. At
    100 TB, partition on the natural shard key (source/date/shard id) so
    every group packs independently; the window is a single shuffle on
    that key.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    w = (
        Window.partitionBy(partition_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return df.withColumn(
        "seq_bin", F.floor(prefix / F.lit(budget)).cast("long")
    )


def greedy_pack_sql(
    partition_expr: str, order_expr: str, token_expr: str, budget: int
) -> str:
    """DuckDB SQL twin of :func:`greedy_pack`'s ``seq_bin`` column."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    prefix = (
        f"coalesce(sum({token_expr}) OVER (PARTITION BY {partition_expr} "
        f"ORDER BY {order_expr} ROWS BETWEEN UNBOUNDED PRECEDING AND "
        f"1 PRECEDING), 0)"
    )
    return f"CAST(floor({prefix} / {budget}) AS BIGINT)"


def _check_fractions(fractions: dict[str, float], buckets: int) -> None:
    if not fractions:
        raise ValueError("fractions must be non-empty")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    for label, frac in fractions.items():
        if int(round(frac * buckets)) == 0:
            raise ValueError(f"fraction for {label!r} rounds to 0/{buckets} buckets")


def _hash_bucket(h, buckets: int):
    """Order-prefix bucket of an md5 hex string: the first 8 hex chars
    read as a 32-bit int, scaled to ``buckets``. Lowercase fixed-width
    hex sorts identically as string and as number, so ``h1 < h2``
    (string) implies ``bucket(h1) <= bucket(h2)`` — each bucket is a
    contiguous PREFIX-RANGE of the ``(h, key)`` sort order, and the
    assignment is a pure function of the VALUE (no physical partition
    ids, no range-sampler: nothing that can disagree between two
    evaluations of the same relation — the sf0.1 parity sweep caught
    exactly that with a spark_partition_id formulation)."""
    p32 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    return F.floor(p32 * F.lit(int(buckets)) / F.lit(4294967296)).cast(
        "long"
    )


def _range_ranked(
    df: DataFrame,
    stratum_col: str,
    key: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed per-stratum rank: ``_r`` = the 1-based rank of each
    row within its stratum under the deterministic ``(md5(key), key)``
    order, ``_n`` = the stratum's row count — WITHOUT ever sorting a
    whole stratum in one task (the zip-with-index construction).

    Mechanics: bucket every row by the ORDER-PREFIX of its md5 rank
    key (:func:`_hash_bucket` — deterministic per value, uniform by
    construction), so each stratum's global order is the concatenation
    of its per-bucket orders; rank rows locally within
    ``(stratum, bucket)`` (groups are ~1/num_partitions of a stratum,
    so a stratum holding most of the corpus still ranks across
    num_partitions tasks); reconstruct the global rank by adding the
    stratum's row count from all earlier buckets — offsets come from
    a tiny ``(stratum, bucket)`` count relation (≤ strata ×
    num_partitions rows) that stays a lazily-broadcast window result,
    never a driver collect. NULL keys hash to a NULL bucket, which
    sorts first in both the offset walk and the local window —
    matching md5's NULLS FIRST position in the naive global order.

    Cost, stated honestly: the input is computed twice in one job
    (once for the counts, once as the probe side) — the standard bill
    for a distributed exact rank; bucket assignment being a pure
    value function makes the two passes agree BY CONSTRUCTION.

    Returns ``(ranked_df, rank_name, count_name)`` — the working
    columns take underscore-prefixed names UNIQUIFIED against the
    caller's schema (review r14: fixed ``_r``/``_h`` names silently
    corrupted a caller column of the same name; the pure-window
    predecessor imposed no naming restrictions and neither does
    this)."""
    if num_partitions is None:
        try:
            num_partitions = int(
                df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
            )
        except ValueError:
            num_partitions = 200
    taken = set(df.columns)

    def uniq(name: str) -> str:
        while name in taken:
            name = "_" + name
        taken.add(name)
        return name

    c_h, c_b, c_r, c_n = uniq("_h"), uniq("_b"), uniq("_r"), uniq("_n")
    c_c, c_os, c_ob, c_off = uniq("_c"), uniq("_ostr"), uniq("_ob"), uniq("_off")
    base = df.withColumn(
        c_h, F.md5(F.col(key).cast("string"))
    ).withColumn(c_b, _hash_bucket(F.col(c_h), num_partitions))
    cnt = base.groupBy(stratum_col, c_b).agg(F.count(F.lit(1)).alias(c_c))
    wo = (
        Window.partitionBy(stratum_col)
        .orderBy(F.asc_nulls_first(c_b))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = cnt.select(
        F.col(stratum_col).alias(c_os),
        F.col(c_b).alias(c_ob),
        F.coalesce(F.sum(c_c).over(wo), F.lit(0)).alias(c_off),
        F.sum(c_c).over(Window.partitionBy(stratum_col)).alias(c_n),
    )
    wl = Window.partitionBy(stratum_col, c_b).orderBy(c_h, key)
    ranked = (
        base.join(
            F.broadcast(off),
            F.col(stratum_col).eqNullSafe(F.col(c_os))
            & F.col(c_b).eqNullSafe(F.col(c_ob)),
        )
        .withColumn(
            c_r, (F.col(c_off) + F.row_number().over(wl)).cast("long")
        )
        .drop(c_h, c_b, c_os, c_ob, c_off)
    )
    return ranked, c_r, c_n


def stratified_split(
    df: DataFrame,
    stratum_col: str,
    key: str,
    fractions: dict[str, float],
    num_partitions: int | None = None,
) -> DataFrame:
    """Tag ``df`` with a ``split`` column whose per-STRATUM proportions
    are EXACT to within one row per boundary (scikit's
    stratified-split contract at Spark scale) — the companion to
    :func:`hash_split`, whose membership is per-row independent and so
    carries binomial noise per stratum (a 100-doc source under an
    80/10/10 hash split can land 73/15/12; this one lands 80/10/10).

    Mechanics: within each stratum, rows rank deterministically by
    ``(md5(key), key)``; row r of n lands in the first split whose
    cumulative per-mille c satisfies ``r*1000 <= c*n`` — ALL-INTEGER
    arithmetic (never ``ceil(0.8*n)``: 0.8 has no exact binary form
    and ``0.8*5`` is 4.000000000000001 in IEEE, so float boundaries
    round differently across engines). Fractions must be multiples of
    1/1000 summing to 1.

    The rank comes from :func:`_range_ranked` — a hash-prefix-bucketed
    offset rank, so a corpus with a handful of strata (the normal
    case: one stratum per source) still splits across
    ``num_partitions`` tasks instead of sorting terabytes in one
    window partition per stratum. Output is bit-identical to the
    naive per-stratum ``row_number`` formulation.

    Tradeoff vs hash_split, documented: exact proportions cost
    append-stability (a new row shifts ranks behind it) — this is a
    SNAPSHOT split for frozen corpora; use hash_split for growing
    ones. DuckDB twin: :func:`stratified_split_sql`."""
    # 'split' is the output contract: an input that already has one
    # would come back with TWO columns of that name (ambiguous for
    # every downstream reference) — refuse loudly, like
    # quantize_vectors' reserved-name guard (review r14 ADVICE)
    if "split" in df.columns:
        raise ValueError(
            "stratified_split reserves the output column name 'split' — "
            "rename or drop the input's 'split' column first"
        )
    permille = _permille(fractions)
    ranked, c_r, c_n = _range_ranked(df, stratum_col, key, num_partitions)
    r = F.col(c_r) * 1000
    n = F.col(c_n)
    expr = None
    cum = 0
    for name, pm in permille.items():
        cum += pm
        cond = r <= F.lit(cum) * n
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return ranked.select(*df.columns, expr.alias("split"))


def _permille(fractions: dict[str, float]) -> dict[str, int]:
    """Validate and convert split fractions to exact per-mille ints."""
    if not fractions:
        raise ValueError("fractions must be non-empty")
    out: dict[str, int] = {}
    for name, f in fractions.items():
        pm = round(f * 1000)
        if abs(pm - f * 1000) > 1e-9 or pm < 0:
            raise ValueError(
                f"fraction for {name!r} must be a non-negative multiple "
                f"of 1/1000, got {f}"
            )
        out[name] = pm
    if sum(out.values()) != 1000:
        raise ValueError(
            f"fractions must sum to 1.0, got {sum(out.values()) / 1000}"
        )
    return out


def stratified_split_sql(
    stratum_col: str,
    key: str,
    fractions: dict[str, float],
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`stratified_split` (same rank order, same
    integer boundary rule)."""
    permille = _permille(fractions)
    case = "CASE"
    cum = 0
    for name, pm in permille.items():
        cum += pm
        # escape like funnel_sql: a quote in a split name must not
        # break the oracle string literal
        case += f" WHEN _r * 1000 <= {cum} * _n THEN '{name.replace(chr(39), chr(39) * 2)}'"
    case += " END"
    return f"""
    SELECT * EXCLUDE (_r, _n), {case} AS split
    FROM (
        SELECT *,
               row_number() OVER (
                   PARTITION BY {stratum_col}
                   ORDER BY md5(CAST({key} AS VARCHAR)), {key}) AS _r,
               COUNT(*) OVER (PARTITION BY {stratum_col}) AS _n
        FROM {table}
    )
    """
