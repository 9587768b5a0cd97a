"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference keeps NO per-sensor state (each message is independently
upserted; crash = restart from Kafka offsets). This [EXT] operator adds
the monitoring the reference's half-wired Graphite stack gestured at
(docker-compose.yml:74-100, commented out): a per-sensor health tracker
that survives micro-batches via Spark-managed state.

Scale contract: state is keyed by ``(sensor_group, sensor_id)`` — the
same key the storage partitions on — so state shuffles once and lives
with its partition; per-key state is a fixed-width tuple (no growth),
and idle sensors are reaped by processing-time timeout. That is the
``applyInPandasWithState`` pattern for unbounded keyspaces at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_readings", LongType()),
        StructField("last_ts_ms", LongType()),
        StructField("max_gap_ms", LongType()),
        StructField("temp_sum", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("sensor_group", StringType()),
        StructField("sensor_id", LongType()),
        StructField("n_readings", LongType()),
        StructField("max_gap_ms", LongType()),
        StructField("avg_temperature", DoubleType()),
    ]
)


def _track(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this key's micro-batch rows into (count, last_ts, max_gap,
    temp_sum) state; emit one health row per key per batch."""
    n, last_ts, max_gap, temp_sum = (
        state.get if state.exists else (0, None, 0, 0.0)
    )
    for pdf in batches:
        pdf = pdf.sort_values("ts_ms")
        for ts in pdf["ts_ms"]:
            ts = int(ts)
            if last_ts is not None and ts - last_ts > max_gap:
                max_gap = ts - last_ts
            last_ts = ts
        n += len(pdf)
        temp_sum += float(pdf["temperature"].sum())
    state.update((n, last_ts, max_gap, temp_sum))
    group, sensor_id = key
    yield pd.DataFrame(
        {
            "sensor_group": [group],
            "sensor_id": [sensor_id],
            "n_readings": [n],
            "max_gap_ms": [max_gap],
            "avg_temperature": [temp_sum / n if n else None],
        }
    )


def sensor_health(
    persisted: DataFrame, idle_timeout: str | None = None
) -> DataFrame:
    """Per-sensor health stream: reading count, max inter-arrival gap,
    running mean temperature — state carried across micro-batches.

    ``persisted`` is the pipeline's output schema (time_received,
    sensor_group, sensor_id, temperature, ...). Works only on streaming
    DataFrames (use a batch groupBy for the one-shot equivalent).
    """
    from pyspark.sql import functions as F

    src = persisted.select(
        "sensor_group",
        "sensor_id",
        (F.unix_millis(F.col("time_received"))).alias("ts_ms"),
        F.col("temperature").cast("double").alias("temperature"),
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout
        else GroupStateTimeout.NoTimeout
    )
    return src.groupBy("sensor_group", "sensor_id").applyInPandasWithState(
        _track,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


# -------------------------------------------------- streaming CMS state
# Same depth/width and the same md5 cell mapping as the batch portable
# grid (functions/sketches.py DEFAULT_DEPTH/DEFAULT_WIDTH/portable_cell)
# — imported, not re-declared — so a streaming state snapshot and a
# batch cms_cells_from_counts grid address IDENTICAL cells and merge by
# cell-wise addition across the batch/stream boundary.
from unimib_simpss_spark.functions.sketches import (  # noqa: E402
    DEFAULT_DEPTH as CMS_DEPTH,
    DEFAULT_WIDTH as CMS_WIDTH,
)

_CMS_STATE_SCHEMA = StructType(
    [StructField("cells", ArrayType(LongType())), StructField("total", LongType())]
)

_CMS_OUTPUT_SCHEMA = StructType(
    [
        StructField("group_key", StringType()),
        StructField("token", StringType()),
        StructField("est", LongType()),
        StructField("total", LongType()),
    ]
)


def _cms_probe(token: str, j: int) -> int:
    """Cell for (token, hash row j): the EXACT math of the batch twin's
    ``portable_cell`` — 60-bit int from the first 15 md5 hex chars of
    "j:token", mod width. (md5 is stable across workers/restarts,
    unlike PYTHONHASHSEED-dependent hash().)"""
    import hashlib

    h = hashlib.md5(f"{j}:{token}".encode()).hexdigest()
    return int(h[:15], 16) % CMS_WIDTH


def _cms_track(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this key's tokens into a fixed depth×width count-min grid
    held in Spark-managed state; emit the current top-5 estimates.

    The state is FIXED-SIZE (depth×width longs) no matter how many
    distinct tokens the key ever sees — the whole point of sketch-typed
    streaming state versus a per-token map that grows without bound.
    Batch counts fold in cell-wise (CMS is additive), so restarts and
    micro-batch boundaries are invisible to the estimates.
    """
    if state.exists:
        cells, total = state.get
        cells = list(cells)
        if len(cells) != CMS_DEPTH * CMS_WIDTH:
            raise ValueError(
                f"restored CMS state has {len(cells)} cells, expected "
                f"{CMS_DEPTH * CMS_WIDTH} — the grid geometry changed "
                "across a checkpoint; restart with a fresh checkpoint dir"
            )
    else:
        cells, total = [0] * (CMS_DEPTH * CMS_WIDTH), 0
    seen: set[str] = set()
    for pdf in batches:
        for tok in pdf["token"]:
            tok = str(tok)
            seen.add(tok)
            total += 1
            for j in range(CMS_DEPTH):
                cells[j * CMS_WIDTH + _cms_probe(tok, j)] += 1
    state.update((cells, total))

    def est(tok: str) -> int:
        return min(cells[j * CMS_WIDTH + _cms_probe(tok, j)] for j in range(CMS_DEPTH))

    top = sorted(seen, key=lambda t: (-est(t), t))[:5]
    (group_key,) = key
    yield pd.DataFrame(
        {
            "group_key": [group_key] * len(top),
            "token": top,
            "est": [est(t) for t in top],
            "total": [total] * len(top),
        }
    )


def streaming_token_cms(
    stream: DataFrame, group_col: str, token_col: str
) -> DataFrame:
    """Per-group streaming heavy hitters under fixed memory: a count-min
    grid per group key carried across micro-batches in
    ``applyInPandasWithState``; each batch emits the group's current
    top-5 token estimates among the batch's tokens (overestimates only
    — CMS never undercounts, so true heavy hitters cannot be missed).

    Batch twin with the same math: ``functions/sketches.py`` (build /
    merge / estimate over relations).
    """
    from pyspark.sql import functions as F

    src = stream.select(
        F.col(group_col).cast("string").alias("group_key"),
        F.col(token_col).cast("string").alias("token"),
    )
    return src.groupBy("group_key").applyInPandasWithState(
        _cms_track,
        outputStructType=_CMS_OUTPUT_SCHEMA,
        stateStructType=_CMS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------------------------------------------ streaming Bloom gate
# Same m/k and the same md5 bit mapping as the batch twin
# (functions/sketches.py BLOOM_M/BLOOM_K/portable_cell), so a persisted
# batch bit relation and this state address IDENTICAL positions — the
# two forms can seed/merge each other. Imported, not re-declared, so
# they cannot drift.
from unimib_simpss_spark.functions.sketches import (  # noqa: E402
    BLOOM_K as BLOOM_HASHES,
    BLOOM_M as BLOOM_BITS,
)
# 63 bits per signed long: a fully-set word is 2^63 - 1 == int64 max,
# so bit 63 is never addressed and state.update never overflows the
# LongType array (packing 64 bits/word would need 1 << 63, which does).
_BLOOM_WORD_BITS = 63
_BLOOM_WORDS = -(-BLOOM_BITS // _BLOOM_WORD_BITS)

_BLOOM_STATE_SCHEMA = StructType(
    [
        StructField("words", ArrayType(LongType())),      # active generation
        StructField("prev", ArrayType(LongType())),       # previous generation
        StructField("n_active", LongType()),              # inserts into active
        StructField("n_seen", LongType()),
    ]
)

_BLOOM_OUTPUT_SCHEMA = StructType(
    [
        StructField("group_key", StringType()),
        StructField("doc_key", StringType()),
        StructField("possible_dup", LongType()),
        StructField("n_seen", LongType()),
    ]
)


def _bloom_pos(value: str, j: int) -> int:
    """Bit position for (value, hash row j): the EXACT math of the
    batch twin's ``portable_cell`` — 60-bit int from the first 15 md5
    hex chars of "j:value", mod BLOOM_BITS. (Stable across
    workers/restarts, unlike PYTHONHASHSEED-dependent hash().)"""
    import hashlib

    h = hashlib.md5(f"{j}:{value}".encode()).hexdigest()
    return int(h[:15], 16) % BLOOM_BITS


def _make_bloom_track(rotate_after: int | None):
    """Build the state-fold for :func:`streaming_bloom_gate`.

    Probe-then-insert each document fingerprint against this key's
    Bloom state: emit possible_dup=1 when every bit was ALREADY set in
    the active OR previous generation, 0 when definitely new, then set
    the active bits. State is two packed ``BLOOM_BITS``-bit arrays —
    FIXED memory however many documents the key ever sees, versus
    dropDuplicates state that grows per key.

    ``rotate_after``: on an UNBOUNDED stream a single bitset fills up
    and its FP rate climbs toward 1 — generational rotation bounds it
    forever: when the active generation has absorbed ``rotate_after``
    inserts it becomes the previous generation and a fresh active
    starts. Anything seen within the last ``rotate_after`` inserts is
    GUARANTEED still flagged (it is in active or previous); items older
    than two generations may be forgotten and re-admitted — a sliding
    dedup horizon, the standard production trade for bounded-memory
    streaming dedup. ``None`` never rotates (exact one-sided gate for
    bounded streams)."""

    if rotate_after is not None and rotate_after <= 0:
        raise ValueError(
            f"rotate_after must be positive or None, got {rotate_after}"
        )

    def _bloom_track(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            try:
                words, prev, n_active, n_seen = state.get
            except (ValueError, TypeError) as exc:
                raise ValueError(
                    "restored Bloom state does not match the current "
                    "4-field (words, prev, n_active, n_seen) schema — "
                    "checkpointed under an older layout; restart with a "
                    "fresh checkpoint dir"
                ) from exc
            words, prev = list(words), list(prev)
            # prev is [] until the first rotation (kept empty so the
            # non-rotating default never serializes or probes a
            # permanently-zero second generation)
            if len(words) != _BLOOM_WORDS or len(prev) not in (0, _BLOOM_WORDS):
                raise ValueError(
                    f"restored Bloom state has {len(words)}/{len(prev)} "
                    f"words, expected {_BLOOM_WORDS} for the active "
                    f"generation and 0 or {_BLOOM_WORDS} for the "
                    f"previous (m={BLOOM_BITS}, {_BLOOM_WORD_BITS} "
                    "bits/word) — the bit layout changed across a "
                    "checkpoint; restart with a fresh checkpoint dir "
                    "(reinterpreting old words would silently drop "
                    "re-occurrence flags)"
                )
        else:
            words, prev = [0] * _BLOOM_WORDS, []
            n_active, n_seen = 0, 0
        out_doc: list[str] = []
        out_dup: list[int] = []
        for pdf in batches:
            for doc in pdf["doc_key"]:
                doc = str(doc)
                pos = [_bloom_pos(doc, j) for j in range(BLOOM_HASHES)]
                wb = [
                    (p // _BLOOM_WORD_BITS, p % _BLOOM_WORD_BITS) for p in pos
                ]
                hit = all(words[w] & (1 << b) for w, b in wb) or (
                    bool(prev)
                    and all(prev[w] & (1 << b) for w, b in wb)
                )
                for w, b in wb:
                    words[w] |= 1 << b
                n_active += 1
                n_seen += 1
                out_doc.append(doc)
                out_dup.append(int(hit))
                if rotate_after and n_active >= rotate_after:
                    prev, words = words, [0] * _BLOOM_WORDS
                    n_active = 0
        state.update((words, prev, n_active, n_seen))
        (group_key,) = key
        yield pd.DataFrame(
            {
                "group_key": [group_key] * len(out_doc),
                "doc_key": out_doc,
                "possible_dup": out_dup,
                "n_seen": [n_seen] * len(out_doc),
            }
        )

    return _bloom_track


def streaming_bloom_gate(
    stream: DataFrame,
    group_col: str,
    doc_col: str,
    rotate_after: int | None = None,
) -> DataFrame:
    """Streaming ingest-dedup pre-gate: per-group Bloom state carried
    across micro-batches in ``applyInPandasWithState``; every incoming
    document fingerprint is probed BEFORE insertion, and novel docs
    pass with at most the one-sided FP rate. Without rotation
    (``rotate_after=None``) re-occurrences are ALWAYS flagged (no
    false negatives — within a batch too); with rotation the guarantee
    holds for re-occurrences within the last ``rotate_after`` inserts,
    and OLDER duplicates deliberately age out (see below).

    The streaming twin of q61's batch 'bloom' leg
    (``functions/sketches.py: bloom_bits/bloom_probe``): same
    fixed-memory contract — two ``BLOOM_BITS``-bit generations per key
    forever, where exact streaming dedup state grows with the
    distinct-key count. ``rotate_after`` bounds the FP rate on
    UNBOUNDED streams by generational rotation (see
    :func:`_make_bloom_track`): dedup-within-the-last-``rotate_after``
    -inserts is guaranteed, older items age out — the sliding-horizon
    trade every fixed-memory streaming dedup makes. At 100 TB ingest
    the gate drops definite-new docs straight through and only
    possible-dups pay the expensive batch-side near-dup join.
    """
    from pyspark.sql import functions as F

    src = stream.select(
        F.col(group_col).cast("string").alias("group_key"),
        F.col(doc_col).cast("string").alias("doc_key"),
    )
    return src.groupBy("group_key").applyInPandasWithState(
        _make_bloom_track(rotate_after),
        outputStructType=_BLOOM_OUTPUT_SCHEMA,
        stateStructType=_BLOOM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -------------------------------------------------- streaming HLL state
# Import the precision from the batch twin so the two cannot drift —
# the bit-for-bit parity contract depends on identical geometry.
from unimib_simpss_spark.functions.sketches import HLL_P  # noqa: E402

_HLL_M = 1 << HLL_P
_HLL_RMAX = 60 - HLL_P + 1

_HLL_STATE_SCHEMA = StructType(
    [StructField("regs", ArrayType(LongType())), StructField("n_seen", LongType())]
)

_HLL_OUTPUT_SCHEMA = StructType(
    [
        StructField("group_key", StringType()),
        StructField("n_seen", LongType()),
        StructField("hll_est", DoubleType()),
    ]
)


def _hll_bucket_rank(value: str) -> tuple[int, int]:
    """(bucket, rank) for a value — the EXACT math of the batch twin
    (functions/sketches.py hll_registers): 60-bit md5 int, top p bits
    bucket, rank = leading-zero count of the rest + 1."""
    import hashlib

    h = int(hashlib.md5(value.encode()).hexdigest()[:15], 16)
    rest = h & ((1 << (60 - HLL_P)) - 1)
    rank = _HLL_RMAX if rest == 0 else _HLL_RMAX - rest.bit_length()
    return h >> (60 - HLL_P), rank


def _hll_estimate(regs: list) -> float:
    """Integer-exact harmonic sum + the standard small-range correction
    — identical arithmetic to the batch hll_distinct, so a streaming
    snapshot equals the batch estimate over the same rows."""
    import math

    alpha = 0.7213 / (1.0 + 1.079 / _HLL_M)
    scale = 1 << _HLL_RMAX
    s_present = sum(1 << (_HLL_RMAX - m) for m in regs if m > 0)
    zeros = sum(1 for m in regs if m == 0)
    inv = (s_present + zeros * scale) / float(scale)
    e_raw = alpha * _HLL_M * _HLL_M / inv
    if e_raw <= 2.5 * _HLL_M and zeros > 0:
        return float(_HLL_M) * math.log(float(_HLL_M) / zeros)
    return e_raw


def _round_half_up(x: float, ndigits: int) -> float:
    """Spark's F.round on a double: BigDecimal over the shortest
    decimal repr, HALF_UP. Python's builtin round() is half-even on the
    binary value and can disagree at .5 boundaries — this twin keeps
    the streaming estimate bit-identical to the batch column."""
    import decimal

    q = decimal.Decimal(1).scaleb(-ndigits)
    return float(
        decimal.Decimal(repr(x)).quantize(q, rounding=decimal.ROUND_HALF_UP)
    )


def _hll_track(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        regs, n_seen = state.get
        regs = list(regs)
        if len(regs) != _HLL_M:
            raise ValueError(
                f"restored HLL state has {len(regs)} registers, expected "
                f"{_HLL_M} (p={HLL_P}) — precision changed across a "
                "checkpoint; restart with a fresh checkpoint dir"
            )
    else:
        regs, n_seen = [0] * _HLL_M, 0
    for pdf in batches:
        for v in pdf["value"]:
            if v is None or (isinstance(v, float) and pd.isna(v)):
                continue  # NULLs carry no identity — the batch twin drops them
            b, r = _hll_bucket_rank(str(v))
            if r > regs[b]:
                regs[b] = r
            n_seen += 1
    state.update((regs, n_seen))
    (group_key,) = key
    yield pd.DataFrame(
        {
            "group_key": [group_key],
            "n_seen": [n_seen],
            "hll_est": [_round_half_up(_hll_estimate(regs), 4)],
        }
    )


def streaming_hll_distinct(
    stream: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Per-group streaming distinct-count estimate under fixed memory:
    2^p max-rank registers per key carried across micro-batches in
    ``applyInPandasWithState``; each batch emits the group's current
    estimate. Registers fold by MAX, so batch boundaries, restarts, and
    arrival order are invisible — and because the arithmetic is the
    batch twin's (functions/sketches.py hll_distinct: same md5 hash,
    same integer harmonic sum), a snapshot after N batches EQUALS the
    batch estimate over the same rows, bit for bit.

    The third member of the sketch-state family (count-min = frequency,
    Bloom = membership, HLL = cardinality): per-key state is 2^p longs
    forever, where exact streaming countDistinct state grows with the
    distinct-value count.
    """
    from pyspark.sql import functions as F

    src = stream.select(
        F.col(group_col).cast("string").alias("group_key"),
        F.col(value_col).cast("string").alias("value"),
    )
    return src.groupBy("group_key").applyInPandasWithState(
        _hll_track,
        outputStructType=_HLL_OUTPUT_SCHEMA,
        stateStructType=_HLL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------------------------------------- streaming weighted reservoir
# The streaming twin of operators/sampling.py weighted_sample
# (Efraimidis & Spirakis 2006): keep the n rows with the largest
# ln(u)/w priority seen SO FAR, where the priority column is computed
# JVM-side by the SAME es_priority expression the batch sampler uses —
# so after any prefix of the stream the reservoir equals the batch
# sample of that prefix, bit for bit (the property the parity test
# asserts). State per group is exactly n (key, priority, weight)
# triples — fixed memory forever, the defining reservoir property.
#
# Scale shape: one group = one reservoir = one task. For corpus-wide
# sampling at 100 TB, shard first (group_col = a hash bucket), then
# merge the ≤ n-per-shard reservoirs by the same top-n rule — the
# priorities are globally comparable because they depend only on
# (key, weight), not on which shard scored them.

_RESERVOIR_STATE_SCHEMA = StructType(
    [
        StructField("keys", ArrayType(StringType())),
        StructField("es", ArrayType(DoubleType())),
        StructField("weights", ArrayType(DoubleType())),
        StructField("n_seen", LongType()),
    ]
)

_RESERVOIR_OUTPUT_SCHEMA = StructType(
    [
        StructField("group_key", StringType()),
        StructField("rank", LongType()),
        StructField("sample_key", StringType()),
        StructField("es", DoubleType()),
        StructField("weight", DoubleType()),
        StructField("n_seen", LongType()),
    ]
)


def _make_reservoir_track(n: int):
    def _track_reservoir(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            keys, es, weights, n_seen = state.get
            pool = list(zip(list(keys), list(es), list(weights)))
        else:
            pool, n_seen = [], 0
        for pdf in batches:
            n_seen += len(pdf)
            pool.extend(
                zip(pdf["sample_key"], pdf["es"], pdf["weight"])
            )
            # truncate within the batch loop too: the pool never holds
            # more than n + batch rows
            pool.sort(key=lambda t: (-t[1], t[0]))
            del pool[n:]
        state.update(
            (
                [t[0] for t in pool],
                [float(t[1]) for t in pool],
                [float(t[2]) for t in pool],
                n_seen,
            )
        )
        (group_key,) = key
        yield pd.DataFrame(
            {
                "group_key": group_key,
                "rank": range(1, len(pool) + 1),
                "sample_key": [t[0] for t in pool],
                "es": [float(t[1]) for t in pool],
                "weight": [float(t[2]) for t in pool],
                "n_seen": n_seen,
            }
        )

    return _track_reservoir


def streaming_reservoir(
    src: DataFrame,
    n: int,
    weight_col: str,
    key: str,
    group_col: str | None = None,
    buckets: int = 1 << 60,
) -> DataFrame:
    """Fixed-size weighted reservoir sample over a stream: emits each
    group's current top-``n`` (by the deterministic ES priority) every
    micro-batch, with ``n_seen`` counting rows admitted so far.

    Rows with NULL/NaN/non-positive weight are excluded (the batch
    twin's rule). ``group_col=None`` samples the whole stream as one
    group; pass a hash-bucket column to shard (merge shard reservoirs
    downstream by the same top-n rule). Tie-break on equal priorities
    is the STRING form of the key — ties require an xxhash64 collision
    between distinct keys, so this is theoretical."""
    from pyspark.sql import functions as F

    from unimib_simpss_spark.operators.sampling import es_priority

    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    w = F.col(weight_col).cast("double")
    g = (F.col(group_col) if group_col else F.lit("all")).cast("string")
    rows = src.where(w.isNotNull() & ~F.isnan(w) & (w > 0)).select(
        g.alias("group_key"),
        F.col(key).cast("string").alias("sample_key"),
        es_priority(weight_col, key, buckets).alias("es"),
        w.alias("weight"),
    )
    return rows.groupBy("group_key").applyInPandasWithState(
        _make_reservoir_track(n),
        outputStructType=_RESERVOIR_OUTPUT_SCHEMA,
        stateStructType=_RESERVOIR_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------------------------------------------- streaming KLL quantiles
# The streaming twin of functions/sketches.py kll_quantiles: one KLL
# sketch per group key carried across micro-batches in Spark-managed
# state. Because the sketch's compaction coins are DETERMINISTIC
# (functions/kll.py), the state after any prefix of the stream is
# bit-identical to a sequential fold of the same rows in the same order
# — the property the parity test asserts — and estimates carry KLL's
# distribution-free ±O(1/k) rank bound at every snapshot.
#
# State per key is the serialized sketch: O(k·log(n/k)) items no matter
# how many rows stream through — the fixed-memory contract shared by
# the CMS (frequency), Bloom (membership), HLL (cardinality), and
# reservoir (sampling) members of this family; KLL adds QUANTILES.

_KLL_STATE_SCHEMA = StructType(
    [
        StructField("sk", BinaryType()),
        StructField("n_seen", LongType()),
    ]
)

_KLL_OUTPUT_SCHEMA = StructType(
    [
        StructField("group_key", StringType()),
        StructField("n_seen", LongType()),
        StructField("p50", DoubleType()),
        StructField("p90", DoubleType()),
        StructField("p99", DoubleType()),
    ]
)

_KLL_PS = {"p50": 0.5, "p90": 0.9, "p99": 0.99}


def _make_kll_track(k: int):
    def track(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        from unimib_simpss_spark.functions.kll import KLL

        if state.exists:
            raw, n_seen = state.get
            sk = KLL.from_bytes(bytes(raw))
            if sk.k != k:
                raise ValueError(
                    f"restored KLL state has k={sk.k}, expected {k} — "
                    "parameter changed across a checkpoint; restart "
                    "with a fresh checkpoint dir"
                )
        else:
            sk = KLL(k)
        for pdf in batches:
            for v in pdf["value"]:
                if v is None or pd.isna(v):
                    continue  # batch twin drops NULLs
                sk.add(float(v))
        state.update((sk.to_bytes(), sk.n))
        (group_key,) = key
        ests = (
            sk.quantiles(list(_KLL_PS.values()))
            if sk.n
            else [None] * len(_KLL_PS)
        )
        yield pd.DataFrame(
            {
                "group_key": [group_key],
                "n_seen": [sk.n],
                **{
                    name: [round(e, 4) if e is not None else None]
                    for name, e in zip(_KLL_PS, ests)
                },
            }
        )

    return track


def streaming_kll_quantiles(
    stream: DataFrame, group_col: str, value_col: str, k: int = 200
) -> DataFrame:
    """Per-group streaming quantile estimates under fixed memory: a KLL
    sketch per key carried across micro-batches; each batch emits the
    group's current p50/p90/p99 with ``n_seen``. See the module-level
    note above for the determinism/parity and state-size contracts."""
    from pyspark.sql import functions as F

    src = stream.select(
        F.col(group_col).cast("string").alias("group_key"),
        F.col(value_col).cast("double").alias("value"),
    )
    return src.groupBy("group_key").applyInPandasWithState(
        _make_kll_track(k),
        outputStructType=_KLL_OUTPUT_SCHEMA,
        stateStructType=_KLL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------------------------------------------------ streaming EWMA
# The streaming twin of operators/timeseries.py ewma: per-key state is
# (last_ewma, sum, n, last_ts) — O(1) floats forever. The fold arithmetic
# and order are the batch form's (alpha*x + (1-alpha)*y, left to right),
# so after any prefix of an in-order stream the snapshot is BIT-IDENTICAL
# to the batch EWMA of those rows — the parity the test asserts.

_EWMA_STATE_SCHEMA = StructType(
    [
        StructField("y", DoubleType()),
        StructField("s", DoubleType()),
        StructField("n", LongType()),
        StructField("last_ts", DoubleType()),
    ]
)

_EWMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("n", LongType()),
        StructField("last_ts", DoubleType()),
        StructField("ewma", DoubleType()),
        StructField("mean", DoubleType()),
    ]
)


def _make_ewma_track(alpha: float, ndigits: int):
    def track(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            y, s, n, last_ts = state.get
        else:
            y, s, n, last_ts = None, 0.0, 0, None
        for pdf in batches:
            pdf = pdf.sort_values(["ts", "v"], kind="mergesort")
            for ts, v in zip(pdf["ts"], pdf["v"]):
                if v is None or pd.isna(v) or ts is None or pd.isna(ts):
                    continue
                v = float(v)
                y = v if y is None else alpha * v + (1.0 - alpha) * y
                s += v
                n += 1
                last_ts = float(ts)
        state.update((y, s, n, last_ts))
        (group_key,) = key
        yield pd.DataFrame(
            {
                "key": [group_key],
                "n": [n],
                "last_ts": [last_ts],
                "ewma": [round(y, ndigits) if y is not None else None],
                "mean": [round(s / n, ndigits) if n else None],
            }
        )

    return track


def streaming_ewma(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    alpha: float = 0.3,
    ndigits: int = 6,
) -> DataFrame:
    """Per-key streaming EWMA under O(1) state; each micro-batch emits
    the key's current ``(n, last_ts, ewma, mean)`` snapshot. See the
    module note above for the batch-parity contract. Rows are folded in
    (ts, value) order WITHIN each batch (matching the batch sort);
    cross-batch order is arrival order — pair with a watermark upstream
    if the source can deliver late data."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    from pyspark.sql import functions as F

    src = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).cast("double").alias("ts"),
        F.col(val_col).cast("double").alias("v"),
    )
    return src.groupBy("key").applyInPandasWithState(
        _make_ewma_track(alpha, ndigits),
        outputStructType=_EWMA_OUTPUT_SCHEMA,
        stateStructType=_EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -------------------------------------------- streaming pattern match
# The streaming twin of operators/timeseries.py pattern_topk, CEP
# flavor: per-key state is the last m-1 values (plus a running row
# counter) — O(pattern) floats forever — and each arriving value
# completes one window, scored with the SAME z-normalized Euclidean
# fold as the batch operator. A hit whose window straddles a
# micro-batch boundary is still detected, because the state carries the
# tail of the previous batch — the property the test plants.

_PATTERN_STATE_SCHEMA = StructType(
    [
        StructField("tail", ArrayType(DoubleType())),
        StructField("n_seen", LongType()),
    ]
)

_PATTERN_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("start_pos", LongType()),
        StructField("dist", DoubleType()),
    ]
)


def _make_pattern_track(qz: list, m: int, threshold: float, ndigits: int):
    mf = float(m)
    qsum = sum(qz)
    qss = sum(q * q for q in qz)

    def track(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            tail, n_seen = state.get
            tail = list(tail)
        else:
            tail, n_seen = [], 0
        (group_key,) = key
        hits: list[tuple] = []
        for pdf in batches:
            pdf = pdf.sort_values(["ts", "v"], kind="mergesort")
            for ts, v in zip(pdf["ts"], pdf["v"]):
                # the batch twin filters NULL/NaN ts AND value; mirror
                # it exactly or start_pos drifts off the batch answer
                if v is None or pd.isna(v) or ts is None or pd.isna(ts):
                    continue
                tail.append(float(v))
                n_seen += 1
                if len(tail) > m:
                    tail.pop(0)
                if len(tail) == m:
                    # the EXACT closed-form arithmetic of the batch
                    # operator (sum / sum-of-squares / cross-product
                    # folds), same operation order — near-threshold
                    # windows must score identically in both forms
                    s1 = 0.0
                    ss = 0.0
                    sxq = 0.0
                    for x, q in zip(tail, qz):
                        s1 += x
                        ss += x * x
                        sxq += x * q
                    mu = s1 / mf
                    var = ss / mf - mu * mu
                    sd = max(var, 0.0) ** 0.5
                    d2 = (
                        qss
                        if sd == 0
                        else mf - 2.0 * (sxq - mu * qsum) / sd + qss
                    )
                    dist = round(max(d2, 0.0) ** 0.5, ndigits)
                    if dist <= threshold:
                        hits.append((group_key, n_seen - m, dist))
        state.update((tail, n_seen))
        if hits:
            yield pd.DataFrame(
                hits, columns=["key", "start_pos", "dist"]
            )

    return track


def streaming_pattern_match(
    stream: DataFrame,
    pattern: list,
    key_col: str,
    ts_col: str,
    val_col: str,
    threshold: float = 0.5,
    ndigits: int = 6,
) -> DataFrame:
    """Emit ``(key, start_pos, dist)`` whenever a key's latest window
    z-normalizes within ``threshold`` of ``pattern`` — the live form of
    the batch subsequence search, under O(pattern) state per key. See
    the module note above for the boundary-straddling contract."""
    m = len(pattern)
    if m < 2:
        raise ValueError("pattern needs at least 2 points")
    mu_q = sum(pattern) / m
    var_q = sum((x - mu_q) ** 2 for x in pattern) / m
    sd_q = var_q**0.5
    qz = [0.0 if sd_q == 0 else (x - mu_q) / sd_q for x in pattern]
    from pyspark.sql import functions as F

    src = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).cast("double").alias("ts"),
        F.col(val_col).cast("double").alias("v"),
    )
    return src.groupBy("key").applyInPandasWithState(
        _make_pattern_track(qz, m, threshold, ndigits),
        outputStructType=_PATTERN_OUTPUT_SCHEMA,
        stateStructType=_PATTERN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------- streaming anomaly alarm
# The streaming twin of operators/timeseries.py anomalies: per-key
# state is (y, v, n) — the EW mean, EW second moment, and row count —
# and the per-point decision is the SAME pre-update residual test, so
# an in-order stream flags exactly the points the batch fold flags.

_ANOM_STATE_SCHEMA = StructType(
    [
        StructField("y", DoubleType()),
        StructField("v", DoubleType()),
        StructField("n", LongType()),
    ]
)

_ANOM_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("ts", DoubleType()),
        StructField("value", DoubleType()),
        StructField("resid", DoubleType()),
    ]
)


def _make_anomaly_track(alpha: float, k: float, min_n: int, ndigits: int):
    def track(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            y, v, n = state.get
        else:
            y, v, n = None, 0.0, 0
        (group_key,) = key
        hits: list = []
        for pdf in batches:
            pdf = pdf.sort_values(["ts", "v"], kind="mergesort")
            for ts, x in zip(pdf["ts"], pdf["v"]):
                if x is None or pd.isna(x) or ts is None or pd.isna(ts):
                    continue
                x = float(x)
                if y is None:
                    y = x
                else:
                    resid = abs(x - y)
                    sd = v**0.5
                    if n >= min_n and resid > k * sd:
                        hits.append(
                            (group_key, float(ts), x, round(resid, ndigits))
                        )
                    v = alpha * (x - y) * (x - y) + (1.0 - alpha) * v
                    y = alpha * x + (1.0 - alpha) * y
                n += 1
        state.update((y, v, n))
        if hits:
            yield pd.DataFrame(
                hits, columns=["key", "ts", "value", "resid"]
            )

    return track


def streaming_anomalies(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    alpha: float = 0.3,
    k: float = 4.0,
    min_n: int = 5,
    ndigits: int = 6,
) -> DataFrame:
    """Live EWMA-residual anomaly alarm under O(1) per-key state; emits
    one row per anomalous point as it arrives. Identical decisions to
    the batch :func:`~unimib_simpss_spark.operators.timeseries.anomalies`
    on any in-order prefix (asserted in tests)."""
    from pyspark.sql import functions as F

    src = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).cast("double").alias("ts"),
        F.col(val_col).cast("double").alias("v"),
    )
    return src.groupBy("key").applyInPandasWithState(
        _make_anomaly_track(alpha, k, min_n, ndigits),
        outputStructType=_ANOM_OUTPUT_SCHEMA,
        stateStructType=_ANOM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------------------------------------------- streaming funnel
_FUNNEL_STATE_SCHEMA = StructType(
    [StructField("ts_us", ArrayType(LongType()))]
)


def _make_funnel_track(steps: list, key_name: str = "user_id"):
    step_idx = {s: i for i, s in enumerate(steps)}
    k = len(steps)

    def track(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        tps = list(state.get[0]) if state.exists else [None] * k
        (user_id,) = key
        for pdf in batches:
            pdf = pdf.sort_values(["ts_us", "event_id"])
            for t, tp in zip(pdf["ts_us"], pdf["event_type"]):
                if t is None or pd.isna(t):
                    continue
                i = step_idx.get(tp)
                if i is None or tps[i] is not None:
                    continue
                # strictly-after chaining, identical to the batch
                # operator: step i counts only once step i-1 is
                # complete and this event is strictly later
                if i == 0 or (tps[i - 1] is not None and int(t) > tps[i - 1]):
                    tps[i] = int(t)
        state.update((tps,))
        if tps[0] is None:  # batch form emits no row without step 1
            return
        done = sum(1 for t in tps if t is not None)
        # prefix rule: a completed step beyond a gap cannot exist by
        # construction (step i requires step i-1 first)
        yield pd.DataFrame(
            [[user_id, done, *tps]],
            columns=[key_name, "steps_completed"]
            + [f"t{i}_us" for i in range(1, k + 1)],
        )

    return track


def streaming_funnel(
    df: DataFrame,
    steps: list,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Streaming first-completion funnel — the stateful twin of
    ``operators.sessions.funnel_first_completion``: per-user state is
    exactly ``len(steps)`` microsecond longs forever (the completion
    timestamp per step, frozen once set — first-completion semantics
    make the state monotone, so it never grows and never rewrites),
    updated in event order within each micro-batch and carried across
    batches by ``applyInPandasWithState``.

    Emits each user's current ``(steps_completed, t1..tk)`` snapshot
    per batch in update mode (users with no step-1 event emit nothing,
    like the batch form); completion timestamps are µs longs
    (``t{i}_us``) so the batch-parity comparison is integer-exact.

    Parity contract (the EWMA/KLL discipline): with events arriving in
    event-time order across batches, the snapshot after any stream
    prefix EQUALS the batch operator over that prefix — pinned in
    tests/test_streaming.py. Late/out-of-order arrivals fold in
    arrival order within the caller's watermark discipline (a late
    step-1 event cannot retroactively re-chain step 2 — the documented
    difference, same as every stateful op here)."""
    from pyspark.sql import functions as F

    if not steps or len(set(steps)) != len(steps):
        raise ValueError(f"steps must be non-empty and distinct: {steps!r}")
    # the output key keeps the CALLER'S column name and type (ADVICE
    # r13: a hardcoded user_id LongType fails inside
    # applyInPandasWithState on string/int keys — the
    # label_silhouette pattern builds the field from the input schema)
    out_schema = StructType(
        [
            StructField(user_col, df.schema[user_col].dataType),
            StructField("steps_completed", LongType()),
        ]
        + [
            StructField(f"t{i}_us", LongType())
            for i in range(1, len(steps) + 1)
        ]
    )
    src = df.select(
        F.col(user_col).alias("user_id"),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
        F.col(type_col).alias("event_type"),
        F.col(id_col).alias("event_id"),
    )
    return src.groupBy("user_id").applyInPandasWithState(
        _make_funnel_track(list(steps), key_name=user_col),
        outputStructType=out_schema,
        stateStructType=_FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
