"""Embedding similarity search over an ``array<float>`` column.

Two paths, per the ANN playbook:

- **brute-force cosine top-k** — exact baseline. The query set is
  broadcast (small side), the corpus streams; dot products are built-in
  higher-order functions (JVM, codegen) so no Python touches the rows.
- **IVF (cell-probed) top-k** — the scale path: vectors are assigned to
  coarse cells (here the ``label`` column stands in for a k-means
  assignment; at 100 TB that's a precomputed centroid id), and search
  touches only same-cell candidates. Equi-join on cell → shuffle-local.

A Pandas-UDF (Arrow) variant of the dot product is provided for the
bench path — vectorized NumPy beats per-element codegen on wide vectors
when the candidate set is large.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from unimib_simpss_spark.operators.caching import materialize_release


def _np_round6(sims):
    """Round a similarity matrix to 6 digits the way Spark's
    ``F.round`` does on the Column twins: HALF_UP over the double's
    SHORTEST DECIMAL form (``BigDecimal.valueOf``). ``np.round`` is
    half-EVEN, and the integer-domain kernels produce
    exactly-representable halfway cosines (e.g. dot 2 over norms
    16·16 = 0.0078125) where the conventions disagree by one
    ulp-of-report and can flip a rounded-desc tie between the Arrow
    and Column impls (review r16 pass 1).

    Two tiers (review r16 pass 2): the vectorized half-away-from-zero
    floor covers everything except doubles sitting within ~1e-9 of a
    6th-digit half, where binary-value rounding and shortest-decimal
    rounding can still split (0.2614005 stores below the half but its
    shortest repr ends in '5', so F.round goes UP). Those rare
    boundary elements are re-rounded exactly via Decimal(repr(x)) —
    repr IS the shortest form — with ROUND_HALF_UP. NaN/±inf pass
    through untouched (downstream masks own them)."""
    import numpy as np

    with np.errstate(invalid="ignore"):
        out = np.sign(sims) * np.floor(np.abs(sims) * 1e6 + 0.5) / 1e6
        scaled = np.abs(sims) * 1e6
        boundary = np.isfinite(sims) & (
            np.abs(scaled - np.floor(scaled) - 0.5) < 1e-9
        )
    if boundary.any():
        from decimal import ROUND_HALF_UP, Decimal

        flat_idx = np.flatnonzero(boundary.ravel())
        flat_in = sims.ravel()
        flat_out = out.ravel()
        for i in flat_idx:
            flat_out[i] = float(
                Decimal(repr(float(flat_in[i]))).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP
                )
            )
        out = flat_out.reshape(out.shape)
    # np.sign keeps the sign of a tiny negative that rounds to zero, so
    # the Arrow path could emit -0.0 where the Column twin's F.round
    # (BigDecimal) yields +0.0 — == masks it, bitwise/hash comparison
    # would not (ADVICE r16). Collapse both zeros to +0.0.
    out = np.where(out == 0, 0.0, out)
    return np.where(np.isfinite(sims), out, sims)


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


# Bounded-driver contract for every query-side materialization in this
# module: the query set is small by construction (a handful of probe
# vectors), and each function ENFORCES that instead of assuming it —
# a broad query_pred must fail fast or degrade to a shuffle plan, never
# OOM an executor (forced broadcast) or the driver (unbounded collect).
QUERY_SIDE_CAP = 10_000


def _bounded_query_collect(df: DataFrame, cap: int) -> list:
    """Collect the query side under the bounded-driver contract: fetch
    at most ``cap + 1`` rows and raise if the cap is exceeded, so a
    too-broad ``query_pred`` is a loud error, not a silent driver OOM.
    At or under the cap, ``limit`` returns every matching row."""
    rows = df.limit(cap + 1).collect()
    if len(rows) > cap:
        raise ValueError(
            f"query side exceeds the bounded-driver cap ({cap} rows); "
            "tighten query_pred or use the distributed paths "
            "(ivf_topk / cosine_topk with the hint off)"
        )
    return rows


def with_unit_vectors(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Cast to double and attach the L2 norm (cosine denominators)."""
    v = F.col(vec_col).cast("array<double>")
    return emb.withColumn("_v", v).withColumn("_norm", _norm(F.col("_v")))


def defined_vector_pred(vec_col: str = "embedding") -> Column:
    """True only for DEFINED vectors: non-NULL, non-empty, no NULL/NaN
    element. The shared corrupt-row gate for operators whose NumPy
    side would crash (ragged np.stack) or NaN-poison where a SQL
    engine silently skips the bad value — both sides must EXCLUDE the
    row instead (see label_silhouette; its DuckDB twin applies the
    identical rule). An empty vector is 'defined-looking' to a norm
    check (norm([]) = 0.0), hence the explicit size guard."""
    _vn = _norm(F.col(vec_col).cast("array<double>"))
    return (
        F.col(vec_col).isNotNull()
        & (F.size(F.col(vec_col)) > 0)
        # NULL elements → NULL norm; NaN elements → NaN norm
        & _vn.isNotNull()
        & ~F.isnan(_vn)
    )


def _size_gated_side(
    counted: DataFrame,
    queries: DataFrame,
    cap: int | None,
    on_overflow: str = "degrade",
):
    """The size-gate core shared by EVERY broadcast query/anchor side
    in this module (ONE gate, so the semantics can't drift apart —
    ADVICE r11, re-unified when the quantized twin grew a third copy
    in review r15): with ``cap`` set, count ``counted`` (the
    pred-filtered side, projected by the caller so preds referencing
    derived columns resolve identically) and broadcast-hint
    ``queries`` only when it fits. Overflow policy: ``"degrade"``
    returns the unhinted side (AQE picks a shuffled plan — the
    exact-scan contract still holds); ``"raise"`` fails loudly
    (an uncapped anchor × corpus cross join has no acceptable
    shuffled fallback — use :func:`hard_negatives_ivf`, the routed
    scale path). ``cap=None`` skips both the count and the hint and
    lets AQE choose — NEVER force a broadcast that was not
    size-checked (the bounded-driver contract)."""
    if cap is None:
        return queries
    n = counted.limit(cap + 1).count()
    if n <= cap:
        return F.broadcast(queries)
    if on_overflow == "raise":
        raise ValueError(
            f"anchor side exceeds the bounded-driver cap ({cap} rows); "
            "tighten anchor_pred or use hard_negatives_ivf (the "
            "IVF-routed scale path)"
        )
    return queries


def _gated_query_side(
    emb: DataFrame,
    pred: Column,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    cap: int | None,
    on_overflow: str = "degrade",
):
    """:func:`_size_gated_side` counted off the with_unit_vectors
    projection — the float-vector callers' form (:func:`cosine_topk`,
    :func:`hard_negatives`)."""
    counted = (
        with_unit_vectors(emb, vec_col).where(pred).select(F.col(id_col))
    )
    return _size_gated_side(counted, queries, cap, on_overflow)


def cosine_topk(
    emb: DataFrame,
    k: int = 5,
    query_pred: Column | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_query_rows: int | None = QUERY_SIDE_CAP,
) -> DataFrame:
    """Exact brute-force cosine top-k: queries × corpus scan.

    Output: (query_id, neighbor_id, cosine) with deterministic ordering
    (rounded cosine desc, neighbor id asc). Self-matches excluded.

    The broadcast hint on the query side is SIZE-GATED, not forced:
    with ``max_query_rows`` set (default), the query side is counted
    (one cheap limit-bounded job against the pruned scan) and hinted
    only when it fits — a broad ``query_pred`` degrades to a shuffled
    cartesian plan instead of OOMing executors past AQE's size check.
    ``max_query_rows=None`` skips both the count and the hint and lets
    AQE/Catalyst choose from its own statistics.
    """
    base = with_unit_vectors(emb, vec_col).select(
        F.col(id_col).alias("_id"), "_v", "_norm"
    )
    pred = query_pred if query_pred is not None else F.lit(True)
    queries = base.where(pred).select(
        F.col("_id").alias("query_id"),
        F.col("_v").alias("_qv"),
        F.col("_norm").alias("_qn"),
    )
    corpus = base.select(
        F.col("_id").alias("neighbor_id"),
        F.col("_v").alias("_cv"),
        F.col("_norm").alias("_cn"),
    )
    qside = _gated_query_side(
        emb, pred, queries, id_col, vec_col, max_query_rows
    )
    scored = (
        qside.crossJoin(corpus)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rn").cast("long").alias("rank"))
    )


def cosine_topk_sql(k: int = 5, query_pred_sql: str = "TRUE") -> str:
    return f"""
    WITH base AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        FROM embeddings
    ), scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cosine
        FROM (SELECT * FROM base WHERE {query_pred_sql}) q
        JOIN base c ON q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, cosine,
           CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
    FROM scored
    QUALIFY rank <= {k}
    """


def ivf_topk(
    emb: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    impl: str = "arrow",
) -> DataFrame:
    """IVF-style ANN: search only within the query's coarse cell.

    The cell grouping replaces the cross join — at 100 TB with C cells
    this cuts compared pairs by ~C× and co-partitions on the cell id
    (single shuffle, no broadcast needed).

    ``impl='arrow'`` (default): one ``applyInPandas`` GEMM per cell —
    the in-cell all-pairs product runs as a NumPy matmul instead of
    ~pairs×dim interpreted array-lambda ops (order-of-magnitude faster
    at bench scale). Requires a cell's vectors to fit one worker
    (IVF cells are bounded by construction; block the matmul per-cell
    if a cell outgrows memory). ``impl='sql'``: pure Column-expression
    join — no Python anywhere, same contract.
    """
    if impl == "arrow":
        return _ivf_topk_arrow(emb, k, id_col, vec_col, cell_col)
    base = with_unit_vectors(emb, vec_col).select(
        F.col(id_col).alias("_id"), F.col(cell_col).alias("_cell"), "_v", "_norm"
    )
    q = base.select(
        F.col("_id").alias("query_id"),
        F.col("_cell").alias("cell"),
        F.col("_v").alias("_qv"),
        F.col("_norm").alias("_qn"),
    )
    c = base.select(
        F.col("_id").alias("neighbor_id"),
        F.col("_cell").alias("cell"),
        F.col("_v").alias("_cv"),
        F.col("_norm").alias("_cn"),
    )
    scored = (
        q.join(c, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            F.col("cell"),
            "neighbor_id",
            F.round(
                _dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "cell", "neighbor_id", "cosine")
    )


def _ivf_topk_arrow(
    emb: DataFrame, k: int, id_col: str, vec_col: str, cell_col: str
) -> DataFrame:
    """Per-cell GEMM top-k (see :func:`ivf_topk`). Deterministic
    tie-break matches the SQL contract: rounded cosine desc, id asc."""
    import numpy as np
    import pandas as pd

    out_schema = (
        f"query_id long, cell {emb.schema[cell_col].dataType.simpleString()}, "
        "neighbor_id long, cosine double"
    )

    def score_cell(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(id_col)  # stable-argsort ties → id asc
        ids = pdf[id_col].to_numpy()
        mat = np.array(list(pdf[vec_col]), dtype=np.float64)
        n = len(ids)
        if n < 2:
            return pd.DataFrame(
                {"query_id": [], "cell": [], "neighbor_id": [], "cosine": []}
            )
        norms = np.linalg.norm(mat, axis=1)
        sims = _np_round6((mat @ mat.T) / np.outer(norms, norms))
        np.fill_diagonal(sims, -np.inf)
        order = np.argsort(-sims, axis=1, kind="stable")[:, : min(k, n - 1)]
        nq, kk = order.shape
        return pd.DataFrame(
            {
                "query_id": np.repeat(ids, kk),
                "cell": np.repeat(pdf[cell_col].to_numpy(), kk),
                "neighbor_id": ids[order.ravel()],
                "cosine": np.take_along_axis(sims, order, axis=1).ravel(),
            }
        )

    return (
        emb.select(
            F.col(id_col), F.col(cell_col), F.col(vec_col).cast("array<double>").alias(vec_col)
        )
        .groupBy(cell_col)
        .applyInPandas(score_cell, out_schema)
    )


def ivf_topk_sql(k: int = 3) -> str:
    return f"""
    WITH base AS (
        SELECT vec_id, label AS cell, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        FROM embeddings
    ), scored AS (
        SELECT q.vec_id AS query_id, q.cell, c.vec_id AS neighbor_id,
               round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cosine
        FROM base q JOIN base c ON q.cell = c.cell AND q.vec_id <> c.vec_id
    )
    SELECT query_id, cell, neighbor_id, cosine
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, neighbor_id) AS rn
        FROM scored
    ) WHERE rn <= {k}
    """


def cosine_topk_pandas(
    emb: DataFrame,
    k: int = 5,
    query_pred: Column | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_query_rows: int = QUERY_SIDE_CAP,
) -> DataFrame:
    """Arrow/NumPy variant of brute-force top-k for the bench path.

    Queries are collected to a broadcast numpy matrix — the collect is
    ENFORCED under ``max_query_rows`` (:func:`_bounded_query_collect`),
    not assumed small; the corpus streams through mapInPandas, each
    Arrow batch doing one GEMM against the query matrix. Same output
    contract as :func:`cosine_topk`.
    """
    import numpy as np
    import pandas as pd

    out_cols = "query_id long, neighbor_id long, cosine double, rank long"
    qrows = _bounded_query_collect(
        emb.where(query_pred if query_pred is not None else F.lit(True))
        .select(id_col, vec_col),
        max_query_rows,
    )
    if not qrows:
        # empty query side: np.array([]) is 1-D and every axis-1
        # reduction below would raise on the driver — the Column twin
        # returns an empty relation, so must this one
        return emb.sparkSession.createDataFrame([], out_cols)
    q_ids = np.array([r[0] for r in qrows])
    q_mat = np.array([r[1] for r in qrows], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)
    sc = emb.sparkSession.sparkContext
    bq = sc.broadcast((q_ids, q_mat, q_norm))

    out_schema = "query_id long, neighbor_id long, cosine double"

    def score(batches):
        ids, mat, qn = bq.value
        for pdf in batches:
            c_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            c_ids = pdf[id_col].to_numpy()
            sims = (mat @ c_mat.T) / (qn[:, None] * np.linalg.norm(c_mat, axis=1)[None, :])
            nq, nc = sims.shape
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(ids, nc),
                    "neighbor_id": np.tile(c_ids, nq),
                    "cosine": _np_round6(sims.ravel()),
                }
            )

    scored = emb.select(id_col, vec_col).mapInPandas(score, out_schema)
    scored = scored.where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rn").cast("long").alias("rank"))
    )


def cosine_pairs(
    emb: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """Embedding-cosine near-dup mining: all pairs with cosine ≥
    threshold within a coarse cell (one applyInPandas GEMM per cell —
    same scale contract as :func:`ivf_topk`). Cell-scoped by design: at
    100 TB the cell id is a k-means assignment and cross-cell pairs are
    below-threshold by construction of the coarse quantizer."""
    import numpy as np
    import pandas as pd

    cell_t = emb.schema[cell_col].dataType.simpleString()
    out_schema = f"vec1 long, vec2 long, cell {cell_t}, cosine double"

    def pairs_cell(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(id_col)
        ids = pdf[id_col].to_numpy()
        n = len(ids)
        if n < 2:
            return pd.DataFrame({"vec1": [], "vec2": [], "cell": [], "cosine": []})
        mat = np.array(list(pdf[vec_col]), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        sims = _np_round6((mat @ mat.T) / np.outer(norms, norms))
        iu = np.triu_indices(n, 1)
        keep = sims[iu] >= threshold
        return pd.DataFrame(
            {
                "vec1": ids[iu[0][keep]],
                "vec2": ids[iu[1][keep]],
                "cell": np.repeat(pdf[cell_col].iloc[0], int(keep.sum())),
                "cosine": sims[iu][keep],
            }
        )

    return (
        emb.select(
            F.col(id_col),
            F.col(cell_col),
            F.col(vec_col).cast("array<double>").alias(vec_col),
        )
        .groupBy(cell_col)
        .applyInPandas(pairs_cell, out_schema)
    )


def cosine_pairs_sql(threshold: float = 0.35) -> str:
    return f"""
    WITH base AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        FROM embeddings
    )
    SELECT a.vec_id AS vec1, b.vec_id AS vec2, a.label AS cell,
           round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cosine
    FROM base a JOIN base b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= {threshold}
    """


# ------------------------------------------------------------ index builds
def _kmeans_partials(base: DataFrame, centroids) -> DataFrame:
    """One Lloyd iteration's sufficient statistics as a partition-wise
    partial fold: each Arrow batch assigns its vectors to the nearest
    broadcast centroid (one GEMM) and folds them to ≤k rows of
    ``(cell, cnt, s)`` — count and element-wise sum-vector. The job
    moves O(batches × k × d) numbers instead of the n×d exploded rows a
    ``posexplode + groupBy(cell, pos)`` update would shuffle every
    iteration (the same associative-partials shape as PCA's Gram fold
    below). The caller merges partials driver-side: sum of sums / sum
    of counts is exactly the per-cell mean."""
    import numpy as np
    import pandas as pd

    sc = base.sparkSession.sparkContext
    bc = sc.broadcast(np.asarray(centroids, dtype=np.float64))

    def fold(batches):
        c = bc.value
        for pdf in batches:
            mat = np.array(list(pdf["v"]), dtype=np.float64)
            d2 = (
                -2.0 * (mat @ c.T)
                + (c * c).sum(axis=1)[None, :]
                + (mat * mat).sum(axis=1)[:, None]
            )
            cells = np.argmin(np.round(d2, 9), axis=1)
            present = np.unique(cells)
            yield pd.DataFrame(
                {
                    "cell": present.astype("int32"),
                    "cnt": [int((cells == c_).sum()) for c_ in present],
                    "s": [mat[cells == c_].sum(axis=0) for c_ in present],
                }
            )

    return base.mapInPandas(fold, "cell int, cnt long, s array<double>")


def kmeans_cells(
    emb: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    return_centroids: bool = False,
):
    """Build a real IVF coarse quantizer: distributed Lloyd k-means.

    Deterministic throughout: seeds are the k lowest-id vectors, and
    assignment breaks distance ties by centroid index. Per iteration:
    ONE mapInPandas pass both assigns vectors (one GEMM per Arrow batch
    against the broadcast k×d matrix) and folds them to per-cell
    ``(cnt, sum-vector)`` partials (:func:`_kmeans_partials`) — no
    posexplode, no shuffle: the collected job output is
    O(partitions × k × d) numbers, and the driver's sum-of-sums /
    sum-of-counts merge IS the per-cell mean. Only the k×d centroid
    matrix (plus those bounded partials) ever touches the driver —
    bounded regardless of corpus size, which is what makes this the
    100 TB index-build path.

    Returns (vec_id, cell) — the input for :func:`ivf_topk` /
    :func:`cosine_pairs` in place of a precomputed label.
    """
    import numpy as np
    import pandas as pd

    base = emb.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    ).persist()
    seeds = base.orderBy("vec_id").limit(k).collect()
    centroids = np.array([r.v for r in seeds], dtype=np.float64)

    for _ in range(iters):
        parts = _kmeans_partials(base, centroids).collect()
        cnt = np.zeros(k, dtype=np.int64)
        s = np.zeros_like(centroids)
        # collect order is partition order (deterministic for a
        # persisted relation), so the float summation order — and with
        # it the run-to-run bit pattern — is stable
        for r in parts:
            cnt[r.cell] += r.cnt
            s[r.cell] += np.asarray(r.s, dtype=np.float64)
        new_c = centroids.copy()
        nz = cnt > 0
        new_c[nz] = s[nz] / cnt[nz, None]  # empty cells keep their seed
        if np.allclose(new_c, centroids, atol=1e-12):
            centroids = new_c
            break
        centroids = new_c

    # final assignment = the shared frozen-quantizer inference operator
    # (assign_cells), so the batch build, ad-hoc batch inference, and
    # the streaming ingest path all run ONE arithmetic
    out = materialize_release(
        assign_cells(base, centroids, id_col="vec_id", vec_col="v"), base
    )
    if return_centroids:
        # the k×d quantizer itself — already driver-resident by the
        # bounded-collect contract above; IVF-PQ uses it to rank cells
        # for query-side probing
        return out, centroids
    return out


# One broadcast per (Spark context, centroid matrix): a foreachBatch
# body calling assign_cells per micro-batch must reuse the shipped k×d
# copy, not create-and-leak a new broadcast every batch. Keyed by a
# content digest; retrains produce a new matrix → a new (rare) entry.
_CENTROID_BC_CACHE: dict = {}


def _centroid_broadcast(sc, c):
    import hashlib

    key = (sc.applicationId, c.shape, hashlib.md5(c.tobytes()).hexdigest())
    bc = _CENTROID_BC_CACHE.get(key)
    if bc is None:
        bc = sc.broadcast(c)
        _CENTROID_BC_CACHE[key] = bc
    return bc


def assign_cells(
    df: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment under a FROZEN quantizer — the
    inference half of :func:`kmeans_cells`, factored out so the same
    arithmetic runs over a batch corpus or a STRUCTURED STREAM of
    arriving embeddings (``mapInPandas`` is stateless, so the operator
    is streaming-legal as-is): one Arrow-batched GEMM per batch against
    the broadcast k×d matrix, distance ties broken by lowest centroid
    index via the identical ``argmin(round(d2, 9))`` — batch and
    streaming assignments of the same rows agree exactly (the
    stream-static parity test in tests/test_streaming.py).

    This is the 100 TB ingest path for a serving ANN index: embeddings
    stream in, get cell-routed at arrival (no shuffle, no state — the
    quantizer broadcast is cached per (context, matrix), so per-batch
    ``foreachBatch`` calls reuse one shipped copy instead of
    accumulating broadcasts), and land partition-aligned with the IVF
    index :func:`ivf_topk` probes. Retraining the quantizer is a
    periodic batch job (:func:`kmeans_cells`); this operator is the
    cheap continuous half between retrains.

    Malformed arrivals (review r11 pass 3 — one bad record must not
    kill a long-running ingest query with an inscrutable NumPy error):
    NULL embeddings carry no identity and are DROPPED (the
    ``hll_registers`` convention); a wrong-dimension vector is data
    corruption and raises a clear error naming the offending ids.
    """
    import numpy as np
    import pandas as pd

    c = np.asarray(centroids, dtype=np.float64)
    bc = _centroid_broadcast(df.sparkSession.sparkContext, c)
    dim = c.shape[1]
    src = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).where(F.col("v").isNotNull())

    def batches(it):
        cm = bc.value
        for pdf in it:
            if not len(pdf):
                continue
            bad = [
                i for i, v in zip(pdf["vec_id"], pdf["v"]) if len(v) != dim
            ]
            if bad:
                raise ValueError(
                    f"assign_cells: vectors with dimension != {dim} for "
                    f"{id_col} in {bad[:10]} — corrupt input, not missing "
                    "data (NULL embeddings are dropped; ragged ones are "
                    "not silently skippable)"
                )
            mat = np.array(list(pdf["v"]), dtype=np.float64)
            # a NULL ELEMENT inside a vector survives the row-level
            # NULL filter and the length check — NumPy coerces None to
            # NaN, and argmin over NaN distances would SILENTLY assign
            # cell 0. NaN coordinates (null or genuine) have no nearest
            # centroid; fail loudly with the ids named.
            nan_rows = np.isnan(mat).any(axis=1)
            if nan_rows.any():
                ids = list(pdf["vec_id"][nan_rows][:10])
                raise ValueError(
                    "assign_cells: vector with a null/NaN element for "
                    f"vec_id in {ids} — corrupt input (NULL whole-vector"
                    " rows are dropped; NaN coordinates are not"
                    " silently assignable)"
                )
            d2 = (
                -2.0 * (mat @ cm.T)
                + (cm * cm).sum(axis=1)[None, :]
                + (mat * mat).sum(axis=1)[:, None]
            )
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "cell": np.argmin(np.round(d2, 9), axis=1).astype(
                        "int32"
                    ),
                }
            )

    return src.mapInPandas(batches, "vec_id long, cell int")


def probe_cells(
    df: DataFrame,
    centroids,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The ``nprobe`` nearest quantizer cells per vector — the
    query-side half of IVF probing, generalizing :func:`assign_cells`
    (``nprobe=1`` reproduces its assignment exactly: same GEMM, same
    ``round(d2, 9)`` tie geometry, stable argsort → ties break by
    lowest centroid index just like argmin). Output:
    ``(vec_id, cell, probe_rank)`` with ``probe_rank`` 0-based by
    distance.

    Stateless Arrow-batched GEMM against the cached broadcast k×d
    matrix — streaming-legal, no shuffle, driver state bounded by the
    quantizer. Malformed-input policy is inherited verbatim from
    :func:`assign_cells` (NULL vectors drop; ragged/NaN raise with ids
    named)."""
    import numpy as np
    import pandas as pd

    c = np.asarray(centroids, dtype=np.float64)
    if not 1 <= nprobe <= c.shape[0]:
        raise ValueError(
            f"nprobe must be in [1, {c.shape[0]}] (the cell count), "
            f"got {nprobe}"
        )
    bc = _centroid_broadcast(df.sparkSession.sparkContext, c)
    dim = c.shape[1]
    src = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).where(F.col("v").isNotNull())

    def batches(it):
        cm = bc.value
        for pdf in it:
            if not len(pdf):
                continue
            bad = [
                i for i, v in zip(pdf["vec_id"], pdf["v"]) if len(v) != dim
            ]
            if bad:
                raise ValueError(
                    f"probe_cells: vectors with dimension != {dim} for "
                    f"{id_col} in {bad[:10]} — corrupt input"
                )
            mat = np.array(list(pdf["v"]), dtype=np.float64)
            nan_rows = np.isnan(mat).any(axis=1)
            if nan_rows.any():
                ids = list(pdf["vec_id"][nan_rows][:10])
                raise ValueError(
                    "probe_cells: vector with a null/NaN element for "
                    f"vec_id in {ids} — corrupt input"
                )
            d2 = np.round(
                -2.0 * (mat @ cm.T)
                + (cm * cm).sum(axis=1)[None, :]
                + (mat * mat).sum(axis=1)[:, None],
                9,
            )
            order = np.argsort(d2, axis=1, kind="stable")[:, :nprobe]
            n, p = order.shape
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), p),
                    "cell": order.ravel().astype("int32"),
                    "probe_rank": np.tile(
                        np.arange(p, dtype="int32"), n
                    ),
                }
            )

    return src.mapInPandas(batches, "vec_id long, cell int, probe_rank int")


def hyperplane_lsh_topk(
    emb: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH cosine ANN: sign-bit signatures bucket the
    corpus; exact cosine runs only within colliding buckets.

    Deterministic planes (fixed-seed Gaussian). Recall per true
    neighbor at angle θ is 1-(1-(1-θ/π)^planes)^tables — tunable,
    measured in tests against the brute-force baseline. Candidate
    generation is a bucket equi-join: cost ∝ collisions, never pairs.
    Output matches the cosine_topk contract (minus exactness).
    """
    import numpy as np

    dim = len(emb.select(vec_col).first()[0])
    rng = np.random.RandomState(42)
    planes = rng.standard_normal((n_tables, n_planes, dim))

    base = with_unit_vectors(emb, vec_col).select(
        F.col(id_col).alias("_id"), "_v", "_norm"
    )
    # signature per table: packed sign bits of the n_planes projections
    sig_cols = []
    for t in range(n_tables):
        bits = [
            F.when(
                F.aggregate(
                    F.zip_with(
                        F.col("_v"),
                        F.array(*[F.lit(float(w)) for w in planes[t][p]]),
                        lambda x, y: x * y,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                >= 0,
                F.lit(1 << p),
            ).otherwise(F.lit(0))
            for p in range(n_planes)
        ]
        sig_cols.append(sum(bits[1:], bits[0]).alias(f"sig{t}"))
    signed = base.select("_id", "_v", "_norm", *sig_cols).persist()
    buckets = signed.select(
        "_id",
        "_v",
        "_norm",
        F.posexplode(F.array(*[F.col(f"sig{t}") for t in range(n_tables)])).alias(
            "table_id", "bucket"
        ),
    )
    cand = (
        buckets.alias("a")
        .join(buckets.alias("b"), ["table_id", "bucket"])
        .where(F.col("a._id") != F.col("b._id"))
        .select(
            F.col("a._id").alias("query_id"),
            F.col("b._id").alias("neighbor_id"),
            F.round(
                _dot(F.col("a._v"), F.col("b._v"))
                / (F.col("a._norm") * F.col("b._norm")),
                6,
            ).alias("cosine"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    out = (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rn").cast("long").alias("rank"))
    )
    return materialize_release(out, signed)


# ------------------------------------------------- product quantization
def pq_codebooks(
    emb: DataFrame,
    m: int = 4,
    ksub: int = 16,
    iters: int = 10,
    sample_cap: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Train PQ codebooks: ``m`` subspaces × ``ksub`` centroids each.

    Product quantization (Jégou et al., "Product Quantization for
    Nearest Neighbor Search", TPAMI 2011) compresses a d-dim float
    vector to ``m`` small codes — 16× smaller at float32/m-byte codes —
    which is what lets a 100 TB embedding corpus fit an ANN index in
    cluster memory.

    Training follows the standard practice (what FAISS does): run Lloyd
    k-means per subspace on a bounded, deterministic sample. The
    driver-side footprint is ``sample_cap × d`` floats plus the
    ``m × ksub × d/m`` codebook — bounded regardless of corpus size,
    same contract as the query-matrix collect in
    :func:`cosine_topk_pandas` and the k seeds in :func:`kmeans_cells`.
    Sampling is hash-ordered (lowest ``xxhash64(id)`` first), so the
    training set is a uniform, rerun/append-stable draw — not the
    file-order head.

    Returns ``np.ndarray`` of shape ``(m, ksub, d//m)``. ``d`` must be
    divisible by ``m``.
    """
    import numpy as np

    rows = (
        emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(sample_cap)
        .collect()
    )
    sample = np.array([r.v for r in rows], dtype=np.float64)
    d = sample.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        sub = sample[:, j * dsub : (j + 1) * dsub]
        # deterministic seeds: first ksub sample rows (hash-ordered draw)
        c = sub[: min(ksub, len(sub))].copy()
        if len(c) < ksub:  # degenerate tiny corpus: pad by repetition
            c = np.resize(c, (ksub, dsub))
        for _ in range(iters):
            d2 = (
                -2.0 * (sub @ c.T)
                + (c * c).sum(axis=1)[None, :]
                + (sub * sub).sum(axis=1)[:, None]
            )
            assign = np.argmin(np.round(d2, 9), axis=1)
            new_c = c.copy()
            for cc in range(ksub):
                mask = assign == cc
                if mask.any():
                    new_c[cc] = sub[mask].mean(axis=0)
            if np.allclose(new_c, c, atol=1e-12):
                c = new_c
                break
            c = new_c
        books[j] = c
    return books


def pq_encode(
    emb: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode vectors to PQ codes: (vec_id, codes array<tinyint>).

    One mapInPandas pass; each Arrow batch does ``m`` small GEMMs
    against the broadcast codebook tensor. Partition-preserving, no
    shuffle — at 100 TB this is a map-only re-encode of the corpus
    producing the (16× smaller) index relation.
    """
    import numpy as np
    import pandas as pd

    books = np.asarray(codebooks, dtype=np.float64)
    m, ksub, dsub = books.shape
    sc = emb.sparkSession.sparkContext
    bb = sc.broadcast(books)

    def encode(batches):
        b = bb.value
        for pdf in batches:
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            codes = np.empty((len(mat), m), dtype=np.int8)
            for j in range(m):
                sub = mat[:, j * dsub : (j + 1) * dsub]
                c = b[j]
                d2 = (
                    -2.0 * (sub @ c.T)
                    + (c * c).sum(axis=1)[None, :]
                    + (sub * sub).sum(axis=1)[:, None]
                )
                codes[:, j] = np.argmin(np.round(d2, 9), axis=1).astype(np.int8)
            yield pd.DataFrame(
                {"vec_id": pdf[id_col], "codes": list(codes)}
            )

    return emb.select(id_col, vec_col).mapInPandas(
        encode, "vec_id long, codes array<tinyint>"
    )


def pq_topk(
    emb: DataFrame,
    k: int = 5,
    query_pred: Column | None = None,
    m: int = 4,
    ksub: int = 16,
    refine: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks=None,
    max_query_rows: int = QUERY_SIDE_CAP,
) -> DataFrame:
    """PQ asymmetric-distance top-k: exact queries scored against the
    compressed corpus, optionally exact-re-ranked.

    Output: (query_id, neighbor_id, d2, rank) — ``d2`` ascending,
    the asymmetric squared-L2 estimate (query vs reconstructed
    neighbor), or the EXACT squared L2 when ``refine`` > 0.
    Self-matches excluded; ties break on neighbor id.

    Scale shape: train on a bounded sample (:func:`pq_codebooks`),
    encode map-only (:func:`pq_encode`), then one mapInPandas scan of
    the CODES relation scores every (query, neighbor) via LUT gather —
    the corpus's float vectors are never read again on the hot path,
    which is the whole point of PQ. The per-query distance LUT tensor
    (nq × m × ksub) is broadcast; global top-k is a per-query window
    over candidate rows.

    ``refine=R`` adds the standard IVFPQ-refine stage: keep the top-R
    shortlist by ADC, then rescore ONLY those ``nq × R`` candidates
    against their exact vectors (one keyed join back into the corpus —
    a point-lookup-sized read, not a second scan) and emit the exact
    top-k. This is how PQ recall is bought back at 100 TB: the
    compressed index prunes, the refine join touches R rows per query.

    ``query_pred`` is REQUIRED: the query matrix is collected to the
    driver, and only the predicate bounds that collect (the same
    contract as ``pq_codebooks``' sample_cap). A None default would
    silently collect the whole corpus. ``codebooks`` accepts the
    pretrained ``pq_codebooks`` tensor so a plan composing several PQ
    paths (x66) trains once.
    """
    import numpy as np
    import pandas as pd

    if query_pred is None:
        raise ValueError(
            "pq_topk requires query_pred: collecting every corpus vector "
            "as a query breaks the bounded-driver contract"
        )
    books = (
        np.asarray(codebooks, dtype=np.float64)
        if codebooks is not None
        else pq_codebooks(emb, m=m, ksub=ksub, id_col=id_col, vec_col=vec_col)
    )
    _, _, dsub = books.shape
    qrows = _bounded_query_collect(
        emb.where(query_pred).select(
            id_col, F.col(vec_col).cast("array<double>").alias("v")
        ),
        max_query_rows,
    )
    q_ids = np.array([r[0] for r in qrows])
    q_mat = np.array([r.v for r in qrows], dtype=np.float64)
    # LUT[q, j, c] = ||q_sub_j - codebook[j][c]||^2
    nq = len(q_ids)
    lut = np.empty((nq, m, ksub), dtype=np.float64)
    for j in range(m):
        sub = q_mat[:, j * dsub : (j + 1) * dsub]
        c = books[j]
        lut[:, j, :] = (
            -2.0 * (sub @ c.T)
            + (c * c).sum(axis=1)[None, :]
            + (sub * sub).sum(axis=1)[:, None]
        )
    sc = emb.sparkSession.sparkContext
    bl = sc.broadcast((q_ids, lut))

    codes = pq_encode(emb, books, id_col=id_col, vec_col=vec_col)

    def score(batches):
        ids, l = bl.value
        jj = np.arange(m)
        for pdf in batches:
            cmat = np.array(list(pdf["codes"]), dtype=np.int64)
            c_ids = pdf["vec_id"].to_numpy()
            # gather: dist[q, n] = sum_j LUT[q, j, codes[n, j]]
            d = l[:, jj[None, :], cmat].sum(axis=2)  # (nq, nbatch)
            n = len(c_ids)
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(ids, n),
                    "neighbor_id": np.tile(c_ids, len(ids)),
                    "d2": np.round(d.ravel(), 6),
                }
            )

    scored = codes.mapInPandas(
        score, "query_id long, neighbor_id long, d2 double"
    ).where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("neighbor_id"))
    if refine:
        shortlist = (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= max(refine, k))
            .select("query_id", "neighbor_id")
        )
        qv = emb.where(query_pred).select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("_qv"),
        )
        cv = emb.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("_cv"),
        )
        diff2 = F.aggregate(
            F.zip_with(F.col("_qv"), F.col("_cv"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        scored = (
            shortlist.join(F.broadcast(qv), "query_id")
            .join(cv, "neighbor_id")
            .select("query_id", "neighbor_id", F.round(diff2, 6).alias("d2"))
        )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(
            "query_id", "neighbor_id", "d2", F.col("rn").cast("long").alias("rank")
        )
    )


def _adc_lut(q_mat, books):
    """LUT[q, j, c] = ||q_sub_j - codebook[j][c]||² for every query."""
    import numpy as np

    m, ksub, dsub = books.shape
    nq = len(q_mat)
    lut = np.empty((nq, m, ksub), dtype=np.float64)
    for j in range(m):
        sub = q_mat[:, j * dsub : (j + 1) * dsub]
        c = books[j]
        lut[:, j, :] = (
            -2.0 * (sub @ c.T)
            + (c * c).sum(axis=1)[None, :]
            + (sub * sub).sum(axis=1)[:, None]
        )
    return lut


def ivfpq_topk(
    emb: DataFrame,
    k: int = 5,
    query_pred: Column | None = None,
    n_cells: int = 8,
    nprobe: int = 2,
    m: int = 4,
    ksub: int = 16,
    refine: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    materialize: bool = True,
    codebooks=None,
    max_query_rows: int = QUERY_SIDE_CAP,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """IVF-PQ top-k: the composed production ANN architecture (what a
    FAISS ``IVFx,PQy`` index is) — a learned coarse quantizer prunes
    the scan to ``nprobe`` cells per query, PQ codes score the
    survivors by asymmetric distance, and ``refine`` exact-re-ranks the
    shortlist.

    Output contract matches :func:`pq_topk` (query_id, neighbor_id,
    d2, rank). Scale shape, stage by stage:

    - index build: distributed Lloyd (:func:`kmeans_cells`, driver holds
      k×d) + sample-trained codebooks (:func:`pq_codebooks`) + map-only
      encode joined to its cell id — the stored index relation is
      (vec_id, cell, m-byte codes), 16× smaller than the vectors;
    - query: nearest ``nprobe`` centroids per query rank in the driver
      (nq × k distances over the already-resident centroid matrix),
      becoming a broadcast (query_id, cell) probe relation;
    - search: probe ⋈ codes on CELL (the only join over corpus-sized
      data — equi-keyed, so each task scores one cell's codes against
      the queries probing it) → LUT gather → per-query shortlist →
      optional exact refine touching nq × refine rows.

    Scanned fraction ≈ nprobe / n_cells of the corpus, the IVF
    contract; everything else is bounded by query count or grid size.

    ``materialize=True`` (default) computes the result eagerly so the
    checkpointed cell-assignment relation is released deterministically
    (operators/caching.py contract); pass ``False`` to inspect the lazy
    plan — then the return is the TUPLE ``(out, cells)`` so the caller
    holds a releasable handle on the checkpointed cell relation the
    lazy plan still references (releasing it any other way is
    impossible — the leak the round-6 advice flagged).

    ``query_pred`` is REQUIRED (same bounded-driver contract as
    :func:`pq_topk`); ``codebooks`` accepts a pretrained tensor so a
    composing plan trains once.
    """
    import numpy as np
    import pandas as pd

    if query_pred is None:
        raise ValueError(
            "ivfpq_topk requires query_pred: collecting every corpus vector "
            "as a query breaks the bounded-driver contract"
        )
    cells, centroids = kmeans_cells(
        emb, k=n_cells, iters=3, id_col=id_col, vec_col=vec_col,
        return_centroids=True,
    )
    books = (
        np.asarray(codebooks, dtype=np.float64)
        if codebooks is not None
        else pq_codebooks(emb, m=m, ksub=ksub, id_col=id_col, vec_col=vec_col)
    )
    codes = pq_encode(emb, books, id_col=id_col, vec_col=vec_col).join(
        cells.withColumnRenamed("vec_id", "_cid").withColumnRenamed("cell", "_cell"),
        F.col("vec_id") == F.col("_cid"),
    ).select("vec_id", F.col("_cell").alias("cell"), "codes")

    qrows = _bounded_query_collect(
        emb.where(query_pred).select(
            id_col, F.col(vec_col).cast("array<double>").alias("v")
        ),
        max_query_rows,
    )
    q_ids = np.array([r[0] for r in qrows])
    q_mat = np.array([r.v for r in qrows], dtype=np.float64)
    qd2 = (
        -2.0 * (q_mat @ centroids.T)
        + (centroids * centroids).sum(axis=1)[None, :]
        + (q_mat * q_mat).sum(axis=1)[:, None]
    )
    probe_rows = [
        (int(q_ids[qi]), int(c))
        for qi in range(len(q_ids))
        for c in np.argsort(np.round(qd2[qi], 9), kind="stable")[:nprobe]
    ]
    spark = emb.sparkSession
    probes = spark.createDataFrame(probe_rows, "query_id long, cell int")

    lut = _adc_lut(q_mat, books)
    bl = spark.sparkContext.broadcast({int(i): lut[n] for n, i in enumerate(q_ids)})
    mm = m

    def score(batches):
        luts = bl.value
        jj = np.arange(mm)
        for pdf in batches:
            if not len(pdf):
                continue
            out_q, out_n, out_d = [], [], []
            for qid, grp in pdf.groupby("query_id"):
                l = luts[int(qid)]
                gmat = np.array(list(grp["codes"]), dtype=np.int64)
                d = l[jj[None, :], gmat].sum(axis=1)
                out_q.extend([int(qid)] * len(grp))
                out_n.extend(grp["vec_id"].tolist())
                out_d.extend(np.round(d, 6).tolist())
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "d2": out_d}
            )

    cand = probes.join(codes, "cell").select("query_id", "vec_id", "codes")
    scored = cand.mapInPandas(
        score, "query_id long, neighbor_id long, d2 double"
    ).where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("neighbor_id"))
    if refine:
        shortlist = (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= max(refine, k))
            .select("query_id", "neighbor_id")
        )
        qv = emb.where(query_pred).select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("_qv"),
        )
        cv = emb.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("_cv"),
        )
        diff2 = F.aggregate(
            F.zip_with(F.col("_qv"), F.col("_cv"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        scored = (
            shortlist.join(F.broadcast(qv), "query_id")
            .join(cv, "neighbor_id")
            .select("query_id", "neighbor_id", F.round(diff2, 6).alias("d2"))
        )
    out = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(
            "query_id", "neighbor_id", "d2", F.col("rn").cast("long").alias("rank")
        )
    )
    if not materialize:
        return out, cells
    from unimib_simpss_spark.operators.caching import release_result

    out = materialize_release(out)
    release_result(cells)
    return out


# -------------------------------------------------------------------- PCA
def pca_model(
    emb: DataFrame,
    n_components: int = 16,
    vec_col: str = "embedding",
):
    """Distributed PCA fit over an ``array<float>`` column: returns
    ``(mean, eigvals, components)`` as NumPy arrays (``components`` is
    ``n_components × d``, rows orthonormal, eigvals descending — the
    population-covariance spectrum).

    The standard pre-ANN reduction step (project 768→64 before
    IVF/PQ): PCA needs only the d-vector mean and the d×d Gram matrix,
    both of which accumulate ASSOCIATIVELY — so the cluster pass is one
    ``mapInPandas`` that folds each partition into a single
    ``(count, sum, gram)`` row, and the driver sums per-partition
    partials and eigendecomposes d×d. Driver memory is
    ``partitions × d²`` doubles (bounded by configuration, never by
    corpus size); no vector ever leaves its executor.

    Determinism: partials carry their partition id and the driver sums
    them in partition order, so the same data + partitioning gives
    bit-identical models; eigenvector sign is fixed by making each
    component's largest-magnitude coefficient positive.
    """
    import numpy as np
    import pandas as pd

    rows = emb.select(F.col(vec_col).cast("array<double>").alias("v")).where(
        F.col("v").isNotNull()
    )

    def partials(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        n = 0
        s = None
        g = None
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.asarray(pdf["v"].tolist(), dtype=np.float64)
            n += m.shape[0]
            s = m.sum(axis=0) if s is None else s + m.sum(axis=0)
            g = m.T @ m if g is None else g + m.T @ m
        if n == 0:
            return
        yield pd.DataFrame(
            {"pid": [pid], "n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
        )

    parts = rows.mapInPandas(
        partials, "pid int, n long, s array<double>, g array<double>"
    ).collect()
    if not parts:
        raise ValueError("pca_model: empty input")
    parts.sort(key=lambda r: r.pid)
    n = sum(r.n for r in parts)
    d = len(parts[0].s)
    s = np.zeros(d)
    g = np.zeros((d, d))
    for r in parts:
        s += np.array(r.s)
        g += np.array(r.g).reshape(d, d)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)           # ascending
    order = np.argsort(evals)[::-1][:n_components]
    evals = np.maximum(evals[order], 0.0)
    comps = evecs[:, order].T                    # k × d
    # deterministic sign: largest-|coef| entry of each component > 0
    flips = np.sign(comps[np.arange(len(comps)), np.abs(comps).argmax(axis=1)])
    comps = comps * flips[:, None]
    return mean, evals, comps


def pca_project(
    emb: DataFrame,
    mean,
    components,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "reduced",
    with_error: bool = False,
) -> DataFrame:
    """Project vectors onto a fitted PCA basis: ``(id, reduced)`` with
    ``reduced`` a length-k ``array<double>``; ``with_error=True`` adds
    the per-vector squared reconstruction error.

    Map-only ``mapInPandas`` GEMM — the k×d basis ships in the closure
    (k·d doubles, broadcast-sized), partitioning is preserved, nothing
    shuffles; the reduced relation then feeds IVF/LSH/PQ exactly like
    the raw one, at d/k of the scan width.

    NULL vectors are filtered, mirroring :func:`pca_model` — without
    the filter a single NULL embedding turns the Arrow batch into an
    object array and the executor task dies, so fit would succeed on
    data that projection then crashes on.
    """
    import numpy as np
    import pandas as pd

    mu = np.asarray(mean, dtype=np.float64)
    c = np.asarray(components, dtype=np.float64)

    def project(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.asarray(pdf["v"].tolist(), dtype=np.float64) - mu
            red = m @ c.T
            out = {"__id": pdf["__id"], out_col: [r.tolist() for r in red]}
            if with_error:
                resid = m - red @ c
                out["sq_err"] = (resid * resid).sum(axis=1)
            yield pd.DataFrame(out)

    schema = f"__id long, {out_col} array<double>"
    if with_error:
        schema += ", sq_err double"
    return (
        emb.select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .where(F.col("v").isNotNull())
        .mapInPandas(project, schema)
        .withColumnRenamed("__id", id_col)
    )


def random_projection_basis(d: int, k: int, seed: int = 0):
    """Seeded Johnson-Lindenstrauss basis: ``k`` orthonormalized
    Gaussian directions in ``R^d`` (NumPy RandomState(seed) on the
    driver — deterministic, k×d floats). The fit-free alternative to
    :func:`pca_model` at extreme scale: no corpus pass at all, distance
    preservation within the JL bound instead of variance-optimal.
    Apply with ``pca_project(emb, np.zeros(d), basis)`` — the same
    map-only GEMM."""
    import numpy as np

    rng = np.random.RandomState(seed)
    q, _ = np.linalg.qr(rng.randn(d, k))
    return q.T  # k × d, orthonormal rows


# -------------------------------------------------- hard-negative mining
def hard_negatives(
    emb: DataFrame,
    k: int = 3,
    anchor_pred: Column | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    max_anchor_rows: int | None = QUERY_SIDE_CAP,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each ANCHOR
    vector, the top-k most-cosine-similar vectors with a DIFFERENT
    label — the semantically-closest wrong answers, which is exactly
    what contrastive objectives (InfoNCE/triplet) need as negatives
    (random negatives are trivially separable; hard ones carry the
    gradient signal).

    Output: ``(anchor_id, negative_id, neg_label, cosine, rank)`` with
    deterministic ordering (rounded cosine desc, negative id asc).

    Scale shape: the q36 pattern — the anchor side is bounded
    (``max_anchor_rows`` gate, same bounded-driver contract) and
    broadcast; the corpus streams once; per-anchor top-k is a window
    over anchor-id partitions. At 100 TB with huge anchor sets, use
    :func:`hard_negatives_ivf` (probe nprobe nearest quantizer cells,
    filter cross-label — no anchor cap, no broadcast); this exact form
    is its recall-verification baseline. DuckDB twin:
    :func:`hard_negatives_sql`.
    """
    base = with_unit_vectors(emb, vec_col).select(
        F.col(id_col).alias("_id"),
        F.col(label_col).alias("_lbl"),
        "_v",
        "_norm",
    )
    pred = anchor_pred if anchor_pred is not None else F.lit(True)
    anchors = base.where(pred).select(
        F.col("_id").alias("anchor_id"),
        F.col("_lbl").alias("_albl"),
        F.col("_v").alias("_qv"),
        F.col("_norm").alias("_qn"),
    )
    # shared gate, raise-on-overflow policy: an anchor × corpus cross
    # join past the cap has no acceptable shuffled fallback — the error
    # names hard_negatives_ivf as the routed scale path. cap=None: no
    # count, no hint — AQE decides (a forced broadcast of an unchecked
    # side would violate the bounded-driver contract above).
    anchors = _gated_query_side(
        emb, pred, anchors, id_col, vec_col, max_anchor_rows,
        on_overflow="raise",
    )
    corpus = base.select(
        F.col("_id").alias("negative_id"),
        F.col("_lbl").alias("neg_label"),
        F.col("_v").alias("_cv"),
        F.col("_norm").alias("_cn"),
    )
    scored = (
        anchors.crossJoin(corpus)
        .where(F.col("_albl") != F.col("neg_label"))
        .select(
            "anchor_id",
            "negative_id",
            "neg_label",
            F.round(
                _dot(F.col("_qv"), F.col("_cv"))
                / (F.col("_qn") * F.col("_cn")),
                6,
            ).alias("cosine"),
        )
        # a zero-norm or NULL-element vector has NO defined cosine —
        # without this filter the all-NULL partition would still rank
        # k arbitrary ids as "hard negatives" (garbage training pairs);
        # dropped on BOTH engines (the SQL twin filters identically)
        .where(F.col("cosine").isNotNull())
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("cosine"), F.asc("negative_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(
            "anchor_id",
            "negative_id",
            "neg_label",
            "cosine",
            F.col("rn").cast("long").alias("rank"),
        )
    )


def hard_negatives_sql(k: int = 3, anchor_pred_sql: str = "TRUE") -> str:
    """DuckDB twin of :func:`hard_negatives` (same rounding/ties)."""
    return f"""
    WITH base AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        FROM embeddings
    ), scored AS (
        SELECT q.vec_id AS anchor_id, c.vec_id AS negative_id,
               c.label AS neg_label,
               round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cosine
        FROM (SELECT * FROM base WHERE {anchor_pred_sql}) q
        JOIN base c ON q.label <> c.label
    )
    SELECT anchor_id, negative_id, neg_label, cosine,
           CAST(row_number() OVER (PARTITION BY anchor_id
                ORDER BY cosine DESC, negative_id) AS BIGINT) AS rank
    FROM scored
    WHERE cosine IS NOT NULL
    QUALIFY rank <= {k}
    """


def hard_negatives_pandas(
    emb: DataFrame,
    k: int = 3,
    anchor_pred: Column | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    max_anchor_rows: int = QUERY_SIDE_CAP,
) -> DataFrame:
    """Arrow/NumPy GEMM twin of :func:`hard_negatives` — identical
    contract, ordering, and NULL semantics; the q36 'arrow'-vs-'hof'
    relationship, applied to the negative miner (the HOF form's
    interpreted per-pair array fold was q46's dominant bench cost).

    Physical shape: the cap-enforced anchor collect
    (:func:`_bounded_query_collect`) becomes one broadcast
    (ids, labels, matrix, norms) tuple; the corpus streams once through
    ``mapInPandas``, each Arrow batch doing one GEMM against the anchor
    matrix and emitting only its PER-BATCH top-k per anchor — the
    global top-k of per-batch top-k unions is exact (every global
    winner wins its own batch), so the final window sees ≤ anchors × k
    × batches rows instead of anchors × corpus.

    NULL semantics mirrored from the exact form: NULL-label anchors
    mine nothing, NULL-label corpus rows are never negatives, and
    zero-norm / NaN-element vectors have no defined cosine on either
    side (non-finite cosines are masked exactly where the Column form's
    NULLs drop). Selection and ordering both use the ROUNDED cosine
    (6 dp), so batch boundaries cannot flip ties."""
    import numpy as np
    import pandas as pd

    pred = anchor_pred if anchor_pred is not None else F.lit(True)
    # a whole-NULL embedding has no defined cosine with ANYTHING — the
    # exact form drops every such pair via NULL cosine; here the row
    # must never reach np.array (a None among fixed-width vectors is
    # ragged input and raises inside mapInPandas). Dropping the row
    # pre-collect / pre-GEMM is therefore bit-identical, not a behavior
    # change (ADVICE r12).
    arows = _bounded_query_collect(
        with_unit_vectors(emb, vec_col)
        .where(pred)
        .where(F.col("_v").isNotNull())
        .select(F.col(id_col).alias("_id"), F.col(label_col).alias("_lbl"), "_v"),
        max_anchor_rows,
    )
    lbl_type = emb.schema[label_col].dataType.simpleString()
    out_schema = (
        f"anchor_id long, negative_id long, neg_label {lbl_type}, "
        "cosine double"
    )
    spark = emb.sparkSession
    if not arows:
        empty = spark.createDataFrame([], out_schema)
        return empty.withColumn("rank", F.lit(None).cast("long"))
    a_ids = np.array([r._id for r in arows])
    a_lbl = np.array([r._lbl for r in arows], dtype=object)
    a_mat = np.array([r._v for r in arows], dtype=np.float64)
    a_norm = np.linalg.norm(a_mat, axis=1)
    bq = spark.sparkContext.broadcast((a_ids, a_lbl, a_mat, a_norm))

    def score(batches):
        ids, albl, mat, qn = bq.value
        # pd.isna, not `is None`: a nullable int/float label column
        # surfaces NULLs as NaN in pandas, which `is None` misses —
        # NULL-label anchors mine nothing, NULL-label corpus rows are
        # never negatives (the exact form's NULL-comparison semantics)
        a_ok = ~pd.isna(albl)
        for pdf in batches:
            if not len(pdf):
                continue
            # whole-NULL vectors: same pre-GEMM drop as the anchor
            # side (exact-form NULL-cosine semantics; None would be
            # ragged input to np.array and raise). NULL *elements*
            # survive — numpy maps them to NaN and the finite mask
            # below drops those pairs, matching the exact form.
            pdf = pdf[pdf[vec_col].notna()]
            if not len(pdf):
                continue
            pdf = pdf.sort_values(id_col)  # id asc → stable ties
            c_ids = pdf[id_col].to_numpy()
            c_lbl = pdf[label_col].to_numpy()
            c_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = _np_round6(
                    (mat @ c_mat.T)
                    / (qn[:, None] * np.linalg.norm(c_mat, axis=1)[None, :])
                )
            c_ok = ~pd.isna(c_lbl)
            valid = (
                np.isfinite(sims)
                & a_ok[:, None]
                & c_ok[None, :]
                & (albl[:, None] != c_lbl[None, :])
            )
            sims = np.where(valid, sims, -np.inf)
            kk = min(k, sims.shape[1])
            # stable argsort on -rounded-cosine over id-sorted columns
            # = (cosine desc, id asc), the exact form's window order
            order = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
            top = np.take_along_axis(sims, order, axis=1)
            keep = np.isfinite(top).ravel()
            if not keep.any():
                continue
            yield pd.DataFrame(
                {
                    "anchor_id": np.repeat(ids, kk)[keep],
                    "negative_id": c_ids[order.ravel()][keep],
                    "neg_label": c_lbl[order.ravel()][keep],
                    "cosine": top.ravel()[keep],
                }
            )

    scored = emb.select(id_col, label_col, vec_col).mapInPandas(
        score, out_schema
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("cosine"), F.asc("negative_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(
            "anchor_id",
            "negative_id",
            "neg_label",
            "cosine",
            F.col("rn").cast("long").alias("rank"),
        )
    )


def label_silhouette(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    ndigits: int = 5,
    max_labels: int = 10_000,
) -> DataFrame:
    """Per-label embedding-cluster quality: the CENTROID silhouette
    (Rousseeuw's silhouette with the O(n²) pairwise terms replaced by
    distances to label centroids — the standard O(n·k) form at scale),
    plus cohesion and separation:

    - ``mean_silhouette``: mean over the label's vectors of
      ``(d_other − d_own) / max(d_own, d_other)`` where ``d_own`` is
      the L2 distance to the OWN label centroid and ``d_other`` the
      min distance to any OTHER centroid (0 when both are 0);
    - ``mean_intra``: mean ``d_own`` (cluster radius);
    - ``min_sep``: the centroid's distance to its nearest other
      centroid (pure k×k centroid arithmetic);
    - ``n``: vectors carrying the label.

    The label-quality gate an embedding pipeline reads before trusting
    labels for hard-negative mining or SemDeDup thresholds.

    Scale shape: centroids are a grouped-agg (k×d driver state, gated
    by ``max_labels`` — the bounded-driver contract); the corpus then
    streams ONCE through ``mapInPandas`` against the broadcast
    centroid matrix (per-batch NumPy distance, no corpus shuffle —
    the assign_cells pattern) and only (label, s, d_own) rows reach
    the k-sized final aggregate. Centroid components are rounded to
    9 dp on BOTH engines before any distance, so the only cross-engine
    float drift left is summation order inside the final means —
    absorbed by the ``ndigits`` output rounding. DuckDB twin:
    :func:`label_silhouette_sql`. Corrupt rows — NULL or EMPTY vector,
    NULL label, or any NULL/NaN element (:func:`defined_vector_pred`)
    — are excluded identically on both engines (a NULL element would
    NaN-poison the NumPy distance here while DuckDB's sum() silently
    skips the addend; an empty vector is ragged np.stack input but
    unnests to zero rows — the row shapes where the engines would
    otherwise disagree)."""
    import numpy as np
    import pandas as pd

    e = emb.where(
        defined_vector_pred(vec_col) & F.col(label_col).isNotNull()
    ).select(
        F.col(label_col).alias("_own"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    n_labels = (
        e.select("_own").distinct().limit(max_labels + 1).count()
    )
    if n_labels > max_labels:
        raise ValueError(
            f"label_silhouette: more than {max_labels} labels — the "
            "k×d centroid collect is gated by the bounded-driver "
            "contract (raise max_labels only with the memory to match)"
        )
    # per-dimension means via posexplode + one combinable groupBy —
    # built-ins only; the collect is k×d rows, gated above
    crows = (
        e.select("_own", F.posexplode("_v").alias("_pos", "_val"))
        .groupBy("_own", "_pos")
        .agg(F.avg("_val").alias("_c"))
        .collect()
    )
    by_label: dict = {}
    for r in crows:
        by_label.setdefault(r._own, {})[r._pos] = r._c
    labels = sorted(by_label)
    C = np.round(
        np.array(
            [
                [by_label[l][p] for p in sorted(by_label[l])]
                for l in labels
            ],
            dtype=np.float64,
        ),
        9,
    )
    lbl_idx = {l: i for i, l in enumerate(labels)}
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast((lbl_idx, C))
    lbl_type = emb.schema[label_col].dataType.simpleString()

    def score(batches):
        idx, cm = bc.value
        k = cm.shape[0]
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            D = np.empty((len(pdf), k), dtype=np.float64)
            for j in range(k):
                D[:, j] = np.sqrt(((X - cm[j]) ** 2).sum(axis=1))
            own = np.array([idx[o] for o in pdf["_own"]], dtype=np.int64)
            rows = np.arange(len(pdf))
            d_own = D[rows, own]
            D[rows, own] = np.inf
            d_other = D.min(axis=1) if k > 1 else np.full(len(pdf), np.inf)
            mx = np.maximum(d_own, d_other)
            with np.errstate(divide="ignore", invalid="ignore"):
                # single-label corpora (d_other undefined) score 0 by
                # convention, like the degenerate both-zero case —
                # mirrored in the SQL twin's IS NULL branch
                s = np.where(
                    (mx == 0) | np.isinf(d_other),
                    0.0,
                    (d_other - d_own) / mx,
                )
            yield pd.DataFrame(
                {"label": pdf["_own"], "s": s, "d_own": d_own}
            )

    scored = e.mapInPandas(
        score, f"label {lbl_type}, s double, d_own double"
    )
    per_label = scored.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("s"), ndigits).alias("mean_silhouette"),
        F.round(F.avg("d_own"), ndigits).alias("mean_intra"),
    )
    # separation: k×k centroid arithmetic on the driver (already
    # collected and bounded) — no reason to ship it back to executors
    sep_rows = []
    for i, l in enumerate(labels):
        if len(labels) > 1:
            d = np.sqrt(((C - C[i]) ** 2).sum(axis=1))
            d[i] = np.inf
            sep_rows.append((l, float(d.min())))
        else:
            sep_rows.append((l, None))
    sep = spark.createDataFrame(
        sep_rows, f"label {lbl_type}, min_sep double"
    )
    # rounded through F.round (HALF_UP), matching the SQL twin's
    # round() — Python's builtin round is banker's and would diverge
    # on exact ties
    return per_label.join(F.broadcast(sep), "label").select(
        "label",
        "n",
        "mean_silhouette",
        "mean_intra",
        F.round("min_sep", ndigits).alias("min_sep"),
    )


def defined_vector_sql(vec_col: str = "embedding") -> str:
    """DuckDB twin of :func:`defined_vector_pred`: non-NULL, non-empty,
    no NULL/NaN element — SQL aggregates would silently SKIP a NULL
    addend (and unnest an empty list to zero rows) where NumPy crashes
    or NaN-poisons, so both engines must EXCLUDE the row."""
    return (
        f"({vec_col} IS NOT NULL AND len({vec_col}) > 0 "
        f"AND len(list_filter({vec_col}, "
        f"x -> x IS NULL OR isnan(x::DOUBLE))) = 0)"
    )


def label_silhouette_sql(ndigits: int = 5) -> str:
    """DuckDB twin of :func:`label_silhouette` (same 9-dp centroid
    pin, same k-nearest-other arithmetic)."""
    return f"""
    WITH flat AS (
        SELECT vec_id, label, unnest(embedding)::DOUBLE AS v,
               unnest(range(1, len(embedding) + 1)) AS pos
        FROM embeddings
        WHERE {defined_vector_sql()} AND label IS NOT NULL
    ), cent AS (
        SELECT label, pos, round(avg(v), 9) AS c
        FROM flat GROUP BY label, pos
    ), dist AS (
        SELECT f.vec_id, f.label AS own, c.label AS other,
               sqrt(sum((f.v - c.c) * (f.v - c.c))) AS d
        FROM flat f JOIN cent c ON f.pos = c.pos
        GROUP BY f.vec_id, f.label, c.label
    ), per_vec AS (
        SELECT vec_id, own,
               MIN(CASE WHEN other = own THEN d END)  AS d_own,
               MIN(CASE WHEN other <> own THEN d END) AS d_other
        FROM dist GROUP BY vec_id, own
    ), sil AS (
        SELECT own AS label, d_own,
               CASE WHEN d_other IS NULL THEN 0.0
                    WHEN greatest(d_own, d_other) = 0 THEN 0.0
                    ELSE (d_other - d_own) / greatest(d_own, d_other)
               END AS s
        FROM per_vec
    ), sep AS (
        SELECT a.label, round(min(dd), {ndigits}) AS min_sep FROM (
            SELECT a2.label AS label, b.label AS other,
                   sqrt(sum((a2.c - b.c) * (a2.c - b.c))) AS dd
            FROM cent a2 JOIN cent b
                 ON a2.pos = b.pos AND a2.label <> b.label
            GROUP BY a2.label, b.label
        ) a GROUP BY a.label
    )
    SELECT s.label, s.n, s.mean_silhouette, s.mean_intra, sep.min_sep
    FROM (
        SELECT label, COUNT(*) AS n,
               round(avg(s), {ndigits}) + 0      AS mean_silhouette,
               round(avg(d_own), {ndigits}) + 0  AS mean_intra
        FROM sil GROUP BY label
    ) s LEFT JOIN sep ON s.label = sep.label
    """


def hard_negatives_auto(
    emb: DataFrame,
    k: int = 3,
    anchor_pred: Column | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    max_anchor_rows: int = QUERY_SIDE_CAP,
    centroids=None,
    n_cells: int = 8,
    nprobe: int = 2,
    kmeans_iters: int = 5,
) -> DataFrame:
    """The CC-style auto front door for hard-negative mining (VERDICT
    r12 #3): run the EXACT capped form when the anchor set fits the
    bounded-driver cap, transparently route through
    :func:`hard_negatives_ivf` when it doesn't — a pipeline caller at
    100× scale should degrade to the probed-cell path, not catch a
    ValueError. Same output contract either way; under-cap output is
    bit-identical to :func:`hard_negatives_pandas` (which is itself
    row-identical to :func:`hard_negatives` — the q46 oracle leg stays
    exact), over-cap output is the routed approximation whose recall
    is bounds-tested in tests/test_llm_ops.py.

    One extra action: a ``limit(cap+1).count()`` of the pred-filtered,
    defined-cosine anchors (the same rows the exact form would
    collect) — the price of not knowing the anchor cardinality, and
    O(cap) work regardless of corpus size. ``last_path`` records which
    form ran ('exact' or 'ivf'), the connected_components
    ``last_algorithm`` pattern.

    ``max_anchor_rows`` must be an int here: the front door EXISTS to
    route around the cap, so "no cap" is a contradiction — callers who
    really want the uncapped exact cross join say so explicitly via
    ``hard_negatives(max_anchor_rows=None)`` (review r13: ``None``
    previously crashed with a bare TypeError)."""
    if max_anchor_rows is None:
        raise ValueError(
            "hard_negatives_auto needs an integer max_anchor_rows (the "
            "routing threshold); for the deliberately uncapped exact "
            "form call hard_negatives(max_anchor_rows=None) directly"
        )
    pred = anchor_pred if anchor_pred is not None else F.lit(True)
    n = (
        with_unit_vectors(emb, vec_col)
        .where(pred)
        .where(F.col("_v").isNotNull())
        .select(F.col(id_col))
        .limit(max_anchor_rows + 1)
        .count()
    )
    if n <= max_anchor_rows:
        hard_negatives_auto.last_path = "exact"
        return hard_negatives_pandas(
            emb, k, anchor_pred, id_col, vec_col, label_col,
            max_anchor_rows,
        )
    hard_negatives_auto.last_path = "ivf"
    return hard_negatives_ivf(
        emb, k, anchor_pred, id_col, vec_col, label_col,
        centroids, n_cells, nprobe, kmeans_iters,
    )


def hard_negatives_ivf(
    emb: DataFrame,
    k: int = 3,
    anchor_pred: Column | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    centroids=None,
    n_cells: int = 8,
    nprobe: int = 2,
    kmeans_iters: int = 5,
) -> DataFrame:
    """IVF-routed hard-negative mining — the 100 TB scale path the
    exact :func:`hard_negatives` docstring promises: no anchor-side
    cap, no broadcast of the anchor set, no anchor × corpus cross join.
    Same output contract ``(anchor_id, negative_id, neg_label, cosine,
    rank)``; approximate (a true hard negative outside the probed cells
    is missed), with recall vs the exact baseline bounds-tested in
    tests/test_llm_ops.py.

    Route: corpus vectors land in their nearest quantizer cell
    (:func:`assign_cells` — at 100 TB this relation is PRECOMPUTED by
    the streaming ingest path and stored cell-partitioned); anchors
    probe their ``nprobe`` nearest cells (:func:`probe_cells`); the
    candidate set is one cell equi-join (cost ∝ anchors ×
    nprobe × cell size, co-partitioned on the cell id — never anchors ×
    corpus); cross-label filter, exact cosine, per-anchor top-k. Each
    (anchor, negative) pair appears at most once because a corpus
    vector lives in exactly ONE cell. Pass ``centroids`` (k×d, e.g.
    from ``kmeans_cells(..., return_centroids=True)``) to reuse a
    frozen quantizer; otherwise one is trained here deterministically.

    Corrupt vectors (whole-NULL, NULL/NaN elements, zero norm) have no
    defined cosine: the exact form drops every pair touching one, so
    this routed path drops those ROWS before the quantizer ever sees
    them (assign_cells/probe_cells reject non-finite input by design;
    pre-dropping here keeps the two forms' conventions identical —
    ADVICE r12).
    """
    # _norm is NULL for whole-NULL vectors and NULL-element vectors,
    # NaN for NaN-element vectors, 0 for zero vectors. The isnan guard
    # is load-bearing: Spark orders NaN GREATER than every double, so
    # `NaN > 0` is true (unlike standard SQL) and would leak NaN
    # vectors into the quantizer.
    _vn = _norm(F.col(vec_col).cast("array<double>"))
    emb = emb.where(_vn.isNotNull() & ~F.isnan(_vn) & (_vn > 0))
    if centroids is None:
        from unimib_simpss_spark.operators.caching import release_result

        assigned, centroids = kmeans_cells(
            emb,
            k=n_cells,
            iters=kmeans_iters,
            id_col=id_col,
            vec_col=vec_col,
            return_centroids=True,
        )
        # only the k×d quantizer is needed — the corpus assignment is
        # recomputed lazily below (one stateless GEMM pass) so this
        # operator stays lazy; keeping kmeans' eager checkpoint alive
        # instead would leak its blocks to the caller
        release_result(assigned)
    base = with_unit_vectors(emb, vec_col).select(
        F.col(id_col).alias("_id"),
        F.col(label_col).alias("_lbl"),
        "_v",
        "_norm",
    )
    corpus = base.join(
        assign_cells(emb, centroids, id_col=id_col, vec_col=vec_col)
        .withColumnRenamed("vec_id", "_id"),
        "_id",
    ).select(
        F.col("_id").alias("negative_id"),
        F.col("_lbl").alias("neg_label"),
        "cell",
        F.col("_v").alias("_cv"),
        F.col("_norm").alias("_cn"),
    )
    pred = anchor_pred if anchor_pred is not None else F.lit(True)
    # pred is applied on the SAME with_unit_vectors projection as the
    # exact form, so predicates referencing derived columns resolve
    # identically in both paths
    anchors = base.where(pred)
    aprobes = probe_cells(
        anchors, centroids, nprobe=nprobe, id_col="_id", vec_col="_v"
    ).select(F.col("vec_id").alias("anchor_id"), "cell")
    aside = anchors.select(
        F.col("_id").alias("anchor_id"),
        F.col("_lbl").alias("_albl"),
        F.col("_v").alias("_qv"),
        F.col("_norm").alias("_qn"),
    ).join(aprobes, "anchor_id")
    scored = (
        aside.join(corpus, "cell")
        .where(F.col("_albl") != F.col("neg_label"))
        .select(
            "anchor_id",
            "negative_id",
            "neg_label",
            F.round(
                _dot(F.col("_qv"), F.col("_cv"))
                / (F.col("_qn") * F.col("_cn")),
                6,
            ).alias("cosine"),
        )
        # NULL-cosine pairs (zero-norm / NULL-element vectors) drop,
        # matching the exact form's convention
        .where(F.col("cosine").isNotNull())
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("cosine"), F.asc("negative_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(
            "anchor_id",
            "negative_id",
            "neg_label",
            "cosine",
            F.col("rn").cast("long").alias("rank"),
        )
    )


# ------------------------------------- two-stage prefix-dims rerank
def prefix_rerank_topk(
    emb: DataFrame,
    k: int = 3,
    probe_dims: int = 16,
    shortlist: int = 32,
    query_pred: Column | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_query_rows: int | None = QUERY_SIDE_CAP,
) -> DataFrame:
    """Two-stage coarse-to-fine top-k (the Matryoshka/MRL serving
    pattern): stage 1 scores cosine over only the FIRST
    ``probe_dims`` dimensions (4× fewer bytes through the kernel at
    64→16 — with MRL-trained embeddings the prefix is a faithful
    coarse scorer by construction) and keeps a per-query
    ``shortlist``; stage 2 re-joins ONLY the shortlist rows to the
    full vectors by id and reranks exactly. At 100 TB this is the
    standard alternative to IVF when no cluster structure exists:
    stage 1 streams the corpus at prefix width, stage 2 touches
    ``queries × shortlist`` full vectors, never the corpus.

    Exact-by-construction determinism (NOT exact top-k: a true
    neighbor outside the shortlist is missed — recall is pinned in
    tests and rises with ``shortlist``): both stages order by
    (rounded cosine desc, id asc), so the DuckDB twin
    (:func:`prefix_rerank_topk_sql`) is hash-identical. Output:
    ``(query_id, neighbor_id, cosine, rank)`` like
    :func:`cosine_topk`."""
    if probe_dims < 1:
        raise ValueError(f"probe_dims must be >= 1, got {probe_dims}")
    if shortlist < k:
        raise ValueError(
            f"shortlist ({shortlist}) must be >= k ({k}) — stage 2 can "
            "only rerank what stage 1 kept"
        )
    v = F.col(vec_col).cast("array<double>")
    pv = F.slice(v, 1, probe_dims)
    base = emb.select(
        F.col(id_col).alias("_id"),
        v.alias("_v"),
        pv.alias("_pv"),
    ).select("_id", "_v", "_pv", _norm(F.col("_pv")).alias("_pn"))
    pred = query_pred if query_pred is not None else F.lit(True)
    # stage 1: prefix-width scan
    q1 = base.where(pred).select(
        F.col("_id").alias("query_id"),
        F.col("_pv").alias("_qpv"),
        F.col("_pn").alias("_qpn"),
    )
    c1 = base.select(
        F.col("_id").alias("neighbor_id"),
        F.col("_pv").alias("_cpv"),
        F.col("_pn").alias("_cpn"),
    )
    # count off the SAME projected frame stage 1 filters, so a pred
    # referencing derived columns resolves identically in the gate
    # and the scan (the _gated_query_side discipline)
    q1 = _size_gated_side(
        base.where(pred).select("_id"), q1, max_query_rows
    )
    s1 = (
        q1.crossJoin(c1)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("_qpv"), F.col("_cpv"))
                / (F.col("_qpn") * F.col("_cpn")),
                6,
            ).alias("_pcos"),
        )
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.desc("_pcos"), F.asc("neighbor_id")
    )
    cand = (
        s1.withColumn("_rn", F.row_number().over(w1))
        .where(F.col("_rn") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    # stage 2: full-width exact rerank over shortlist rows only
    full = emb.select(
        F.col(id_col).alias("_fid"), v.alias("_fv")
    ).select("_fid", "_fv", _norm(F.col("_fv")).alias("_fn"))
    scored = (
        cand.join(
            full.select(
                F.col("_fid").alias("query_id"),
                F.col("_fv").alias("_qv"),
                F.col("_fn").alias("_qn"),
            ),
            "query_id",
        )
        .join(
            full.select(
                F.col("_fid").alias("neighbor_id"),
                F.col("_fv").alias("_cv"),
                F.col("_fn").alias("_cn"),
            ),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("_qv"), F.col("_cv"))
                / (F.col("_qn") * F.col("_cn")),
                6,
            ).alias("cosine"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "cosine",
            F.col("rn").cast("long").alias("rank"),
        )
    )


def prefix_rerank_topk_sql(
    k: int = 3,
    probe_dims: int = 16,
    shortlist: int = 32,
    query_pred_sql: str = "TRUE",
) -> str:
    """DuckDB twin of :func:`prefix_rerank_topk` (same prefix slice,
    rounding, and two-stage tie-break)."""
    if probe_dims < 1:
        raise ValueError(f"probe_dims must be >= 1, got {probe_dims}")
    if shortlist < k:
        raise ValueError(f"shortlist ({shortlist}) must be >= k ({k})")
    return f"""
    WITH nb AS (
        SELECT vec_id, v, pv,
               sqrt(list_dot_product(v, v)) AS nrm,
               sqrt(list_dot_product(pv, pv)) AS pnrm
        FROM (
            SELECT vec_id, embedding::DOUBLE[] AS v,
                   (embedding::DOUBLE[])[1:{probe_dims}] AS pv
            FROM embeddings
        )
    ), s1 AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               round(list_dot_product(q.pv, c.pv) / (q.pnrm * c.pnrm), 6)
                   AS pcos
        FROM (SELECT * FROM nb WHERE {query_pred_sql}) q
        JOIN nb c ON q.vec_id <> c.vec_id
        QUALIFY row_number() OVER (PARTITION BY query_id
                 ORDER BY pcos DESC, neighbor_id) <= {shortlist}
    ), scored AS (
        SELECT s1.query_id, s1.neighbor_id,
               round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6)
                   AS cosine
        FROM s1 JOIN nb x ON s1.query_id = x.vec_id
                JOIN nb y ON s1.neighbor_id = y.vec_id
    )
    SELECT query_id, neighbor_id, cosine,
           CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
    FROM scored
    QUALIFY rank <= {k}
    """


# ------------------------------------------------- int8 quantization
def quantize_vectors(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Symmetric per-vector INT8 quantization for embedding storage:
    ``scale = max|x| / 127`` and ``q_i = round(x_i / scale)`` as a
    ``tinyint`` array — 4× smaller than float32 (8× vs float64) on
    the wire and in the lakehouse, the standard storage trade for
    100 TB embedding corpora (recall loss bounded by the
    per-element error ≤ scale/2; pinned in tests). All-zero vectors
    keep ``scale = 1`` so they quantize to zeros instead of 0/0.

    Gate corrupt rows (NULL / NaN elements) with
    :func:`defined_vector_pred` BEFORE quantizing — ``round(NaN)``
    casts differently across engines, the same reason every NumPy-side
    operator here pre-gates. Output: ``(id, *keep, qvec, scale)``;
    invert with :func:`dequantize_vectors`. Pure Column ops — the
    scale binds to a projected column first so the transform lambda
    does not re-reduce the array per element (the PLANS.md HOF trap).
    """
    # qvec/scale are the output CONTRACT (dequantize_vectors reads
    # them by name) — a kept/id column reusing either would shadow or
    # ambiguate silently, so refuse loudly (review r14 pass 2; the
    # internal staging name is uniquified instead)
    clash = {"qvec", "scale"} & ({id_col, *keep})
    if clash:
        raise ValueError(
            f"quantize_vectors reserves the output column names "
            f"{sorted(clash)} — rename the input column(s) first"
        )
    # id/keep/vec overlaps would emit duplicate output columns silently
    # (ambiguous downstream); the vec column additionally must not be
    # re-kept — it is replaced by qvec (review r14 ADVICE)
    out_cols = [id_col, *keep]
    if len(set(out_cols)) != len(out_cols) or vec_col in keep:
        raise ValueError(
            f"quantize_vectors output columns must be distinct: id_col="
            f"{id_col!r}, keep={list(keep)!r} (vec_col {vec_col!r} may "
            "not appear in keep — it is replaced by qvec)"
        )
    c_v = "_v"
    while c_v in {id_col, *keep}:
        c_v = "_" + c_v
    v = F.col(vec_col).cast("array<double>")
    raw = F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)
    staged = emb.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        v.alias(c_v),
        F.when(raw == 0, F.lit(1.0)).otherwise(raw).alias("scale"),
    )
    return staged.select(
        id_col,
        *keep,
        F.transform(
            F.col(c_v),
            lambda x: F.round(x / F.col("scale")).cast("tinyint"),
        ).alias("qvec"),
        "scale",
    )


def dequantize_vectors(
    qdf: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Inverse of :func:`quantize_vectors`: ``x_i ≈ q_i · scale`` back
    as an ``array<double>`` named ``vec_col`` — feed straight into any
    operator here (cosine top-k, IVF, silhouette) to run it over the
    8× smaller stored form."""
    missing = {"qvec", "scale"} - set(qdf.columns)
    if missing:
        raise ValueError(
            f"dequantize_vectors needs the quantize_vectors output "
            f"contract (columns 'qvec' and 'scale'); missing "
            f"{sorted(missing)} — was this relation quantized?"
        )
    return qdf.select(
        id_col,
        *keep,
        F.transform(
            F.col("qvec"),
            lambda x: x.cast("double") * F.col("scale"),
        ).alias(vec_col),
    )


def quantized_embeddings_sql(pred_sql: str = "TRUE") -> str:
    """DuckDB twin of quantize→dequantize over the ``embeddings``
    table (same expression shapes: shared max|x|/127 scale with the
    zero-vector guard, round-half-away-from-zero on both engines,
    TINYINT round-trip) — emits a relation with the ORIGINAL embedding
    column name, so it can CTE-SHADOW the ``embeddings`` view inside
    any existing oracle (the q36 'quant' leg does exactly that)."""
    return f"""
    SELECT vec_id,
           list_transform(
               list_transform(v, x -> CAST(round(x / s) AS TINYINT)),
               q -> q * s) AS embedding,
           label
    FROM (
        SELECT vec_id, v,
               CASE WHEN s0 = 0 THEN 1.0 ELSE s0 END AS s, label
        FROM (
            SELECT vec_id, embedding::DOUBLE[] AS v,
                   list_max(list_transform(embedding::DOUBLE[],
                                           x -> abs(x))) / 127.0 AS s0,
                   label
            FROM main.embeddings  -- schema-qualified: the caller may
            -- CTE-shadow the view name with THIS relation (q36 quant)
            WHERE {pred_sql}
        )
    )
    """


# ------------------------------------------- int8-DOMAIN scoring (SQ8)
def _int_dot(a: Column, b: Column) -> Column:
    """Integer dot product of two int8 arrays in LONG arithmetic —
    exact (no float rounding during accumulation; |dot| ≤ 127²·dim,
    far inside long range) and, because every partial sum is also
    exactly representable as a double for any realistic dim, bit-equal
    to DuckDB's double-accumulated ``list_dot_product`` over the same
    integer values."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def cosine_topk_quantized(
    qdf: DataFrame,
    k: int = 5,
    query_pred: Column | None = None,
    id_col: str = "vec_id",
    max_query_rows: int | None = QUERY_SIDE_CAP,
) -> DataFrame:
    """Exact brute-force cosine top-k scored DIRECTLY in the int8
    domain (SQ8 — the standard middle path between float brute force
    and PQ/ADC): ``cosine = int_dot(qa, qc) / (|qa|·|qc|)`` where the
    dot and both norms are computed over the stored ``tinyint``
    arrays in integer arithmetic. The per-vector scales CANCEL in
    cosine (``x = q·s`` ⇒ ``cos(x_a, x_c) = cos(q_a, q_c)``), so this
    ranks IDENTICALLY to dequantize-then-:func:`cosine_topk` while
    never touching a double array: the 4-8× storage saving reaches
    the scoring kernel's memory bandwidth instead of being paid back
    by a dequantize pass. For dot-product scoring (where scales do
    not cancel) multiply by ``scale_q · scale_c`` — one scalar per
    pair, after the integer kernel.

    Input: :func:`quantize_vectors` output (``id_col``, ``qvec``,
    ``scale``). Same output contract, window, size-gated broadcast,
    and bounded-driver discipline as :func:`cosine_topk`; Arrow twin:
    :func:`cosine_topk_quantized_pandas`; DuckDB twin:
    :func:`cosine_topk_quantized_sql`."""
    missing = {"qvec", "scale"} - set(qdf.columns)
    if missing:
        raise ValueError(
            f"cosine_topk_quantized needs quantize_vectors output; "
            f"missing {sorted(missing)}"
        )
    base = qdf.select(
        F.col(id_col).alias("_id"),
        F.col("qvec").alias("_q"),
        # The norm rides a Generate (explode of a 1-element array), so
        # the zero-norm guard below binds to GENERATOR OUTPUT and cannot
        # be predicate-pushed with its alias substituted (PLANS.md
        # round-4 discipline, the q67 gram-projection pattern). The
        # previous `.where` over a plain projection re-derived the whole
        # sqrt(int_dot(quantize(...))) chain inside the scan filters of
        # BOTH join branches: optimized plan 18 transform(/9 aggregate(
        # vs 6/7 clean; worktree A/B at sf0.1: q36 3.1-3.4 s -> 7.5 s
        # warm (VERDICT r16 #1).
        F.explode(
            F.array(
                F.sqrt(_int_dot(F.col("qvec"), F.col("qvec")).cast("double"))
            )
        ).alias("_qn"),
    ).where(F.col("_qn") > 0)  # zero qvecs have no cosine direction
    pred = query_pred if query_pred is not None else F.lit(True)
    queries = base.where(pred).select(
        F.col("_id").alias("query_id"),
        F.col("_q").alias("_qq"),
        F.col("_qn").alias("_nq"),
    )
    corpus = base.select(
        F.col("_id").alias("neighbor_id"),
        F.col("_q").alias("_cq"),
        F.col("_qn").alias("_nc"),
    )
    queries = _size_gated_side(
        qdf.where(pred).select(id_col), queries, max_query_rows
    )
    scored = (
        queries.crossJoin(corpus)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _int_dot(F.col("_qq"), F.col("_cq")).cast("double")
                / (F.col("_nq") * F.col("_nc")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "cosine",
            F.col("rn").cast("long").alias("rank"),
        )
    )


def cosine_topk_quantized_pandas(
    qdf: DataFrame,
    k: int = 5,
    query_pred: Column | None = None,
    id_col: str = "vec_id",
    max_query_rows: int = QUERY_SIDE_CAP,
) -> DataFrame:
    """Arrow/NumPy twin of :func:`cosine_topk_quantized`: the corpus
    streams through ``mapInPandas`` as int8 matrices and the GEMM
    accumulates in int64 — the same integer-domain arithmetic, Arrow
    batch transfer at 1/8th the float64 width. Row-for-row identical
    output (pytest-pinned against the Column twin)."""
    import numpy as np
    import pandas as pd

    out_cols = "query_id long, neighbor_id long, cosine double, rank long"
    qrows = _bounded_query_collect(
        qdf.where(query_pred if query_pred is not None else F.lit(True))
        .select(id_col, "qvec"),
        max_query_rows,
    )
    if not qrows:
        # empty query side diverged from the Column twin (axis-1
        # reductions on a 0-d array raise) — review r15 pass 2
        return qdf.sparkSession.createDataFrame([], out_cols)
    q_ids = np.array([r[0] for r in qrows])
    q_mat = np.array([r[1] for r in qrows], dtype=np.int64)
    q_norm = np.sqrt((q_mat * q_mat).sum(axis=1).astype(np.float64))
    qok = q_norm > 0  # the Column twin's zero-norm exclusion
    q_ids, q_mat, q_norm = q_ids[qok], q_mat[qok], q_norm[qok]
    if not len(q_ids):
        return qdf.sparkSession.createDataFrame([], out_cols)
    sc = qdf.sparkSession.sparkContext
    bq = sc.broadcast((q_ids, q_mat, q_norm))

    out_schema = "query_id long, neighbor_id long, cosine double"

    def score(batches):
        ids, mat, qn = bq.value
        for pdf in batches:
            c_mat = np.array(list(pdf["qvec"]), dtype=np.int64)
            c_ids = pdf[id_col].to_numpy()
            c_norm = np.sqrt((c_mat * c_mat).sum(axis=1).astype(np.float64))
            cok = c_norm > 0
            if not cok.all():
                c_mat, c_ids, c_norm = c_mat[cok], c_ids[cok], c_norm[cok]
                if not len(c_ids):
                    continue
            sims = (mat @ c_mat.T).astype(np.float64) / (
                qn[:, None] * c_norm[None, :]
            )
            nq, nc = sims.shape
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(ids, nc),
                    "neighbor_id": np.tile(c_ids, nq),
                    "cosine": _np_round6(sims.ravel()),
                }
            )

    scored = qdf.select(id_col, "qvec").mapInPandas(score, out_schema)
    scored = scored.where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "cosine",
            F.col("rn").cast("long").alias("rank"),
        )
    )


def cosine_topk_quantized_sql(
    k: int = 5, query_pred_sql: str = "TRUE", pred_sql: str = "TRUE"
) -> str:
    """DuckDB twin of :func:`cosine_topk_quantized`: quantize with the
    same max|x|/127 + zero-guard expressions, then score in the
    integer domain (the tinyint arrays cast to DOUBLE hold exact
    integer values ≤ 127, so ``list_dot_product`` accumulates the
    identical exact sums Spark's long arithmetic produces)."""
    return f"""
    WITH qbase AS (
        SELECT vec_id,
               list_transform(v, x -> CAST(round(x / s) AS TINYINT)) AS qv
        FROM (
            SELECT vec_id, v,
                   CASE WHEN s0 = 0 THEN 1.0 ELSE s0 END AS s
            FROM (
                SELECT vec_id, embedding::DOUBLE[] AS v,
                       list_max(list_transform(embedding::DOUBLE[],
                                               x -> abs(x))) / 127.0 AS s0
                FROM main.embeddings
                WHERE {pred_sql}
            )
        )
    ), nbase AS (
        SELECT * FROM (
            SELECT vec_id, qv::DOUBLE[] AS dq,
                   sqrt(list_dot_product(qv::DOUBLE[], qv::DOUBLE[])) AS nrm
            FROM qbase
        ) WHERE nrm > 0
    ), scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               round(list_dot_product(q.dq, c.dq) / (q.nrm * c.nrm), 6)
                   AS cosine
        FROM (SELECT * FROM nbase WHERE {query_pred_sql}) q
        JOIN nbase c ON q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, cosine,
           CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
    FROM scored
    QUALIFY rank <= {k}
    """


def ivf_topk_quantized(
    qdf: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    cell_col: str = "cell",
    impl: str = "arrow",
) -> DataFrame:
    """IVF,SQ8 — the FAISS serving combo this stack was missing: the
    coarse cell structure of :func:`ivf_topk` (search only within the
    query's cell — compared pairs cut ~C×, one co-partitioning
    shuffle) with the in-cell scoring in the INT8 DOMAIN
    (:func:`cosine_topk_quantized`'s argument: integer dot + norms
    over the stored tinyint arrays, the per-vector scales cancel in
    cosine), so the 4-8× bandwidth saving reaches the kernel INSIDE
    the cells where the all-pairs work actually happens. At 100 TB
    this is the shape a vector-serving tier runs: quantized corpus,
    cell-pruned candidate set, integer arithmetic on the hot path.

    Input: :func:`quantize_vectors` output JOINED with a cell
    assignment (``id_col``, ``qvec``, ``scale``, ``cell_col`` — from
    :func:`kmeans_cells` or a precomputed label). In-cell ranking is
    IDENTICAL to dequantize-then-:func:`ivf_topk` (scales cancel;
    pytest-pinned), and the output contract matches ivf_topk:
    ``(query_id, cell, neighbor_id, cosine)`` with the rounded-cosine
    desc / id asc tie policy.

    ``impl='column'`` reuses :func:`_int_dot` verbatim (no Python in
    the row path); ``impl='arrow'`` runs one int64 GEMM per cell via
    ``applyInPandas`` — the same 1/8th-width Arrow transfer argument
    as :func:`cosine_topk_quantized_pandas`, an order of magnitude
    faster on the in-cell all-pairs product."""
    missing = {"qvec", cell_col} - set(qdf.columns)
    if missing:
        raise ValueError(
            f"ivf_topk_quantized needs quantize_vectors output with a "
            f"cell column; missing {sorted(missing)}"
        )
    if impl == "arrow":
        return _ivf_topk_quantized_arrow(qdf, k, id_col, cell_col)
    base = qdf.select(
        F.col(id_col).alias("_id"),
        F.col(cell_col).alias("_cell"),
        F.col("qvec").alias("_q"),
        # Generate-folded norm: see cosine_topk_quantized — the same
        # alias-substituted-pushdown trap was added here in review r16
        # (VERDICT r16 #1 names both sites).
        F.explode(
            F.array(
                F.sqrt(_int_dot(F.col("qvec"), F.col("qvec")).cast("double"))
            )
        ).alias("_n"),
    ).where(F.col("_n") > 0)
    # zero-norm (all-zero) qvecs are EXCLUDED on both impls: a zero
    # vector has no cosine direction — 0/0 = NaN, and the two impls
    # would rank NaN opposite ways (Spark desc puts NaN first, numpy
    # argsort last — review r16 pass 2)
    q = base.select(
        F.col("_id").alias("query_id"),
        F.col("_cell").alias("cell"),
        F.col("_q").alias("_qq"),
        F.col("_n").alias("_nq"),
    )
    c = base.select(
        F.col("_id").alias("neighbor_id"),
        F.col("_cell").alias("cell"),
        F.col("_q").alias("_cq"),
        F.col("_n").alias("_nc"),
    )
    scored = (
        q.join(c, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "cell",
            "neighbor_id",
            F.round(
                _int_dot(F.col("_qq"), F.col("_cq")).cast("double")
                / (F.col("_nq") * F.col("_nc")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "cell", "neighbor_id", "cosine")
    )


def _ivf_topk_quantized_arrow(
    qdf: DataFrame, k: int, id_col: str, cell_col: str
) -> DataFrame:
    """Per-cell int64 GEMM top-k (see :func:`ivf_topk_quantized`).
    Same deterministic tie policy as the Column impl: rounded cosine
    desc, id asc (stable argsort over id-sorted rows)."""
    import numpy as np
    import pandas as pd

    out_schema = (
        f"query_id long, "
        f"cell {qdf.schema[cell_col].dataType.simpleString()}, "
        "neighbor_id long, cosine double"
    )

    def score_cell(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(id_col)
        ids = pdf[id_col].to_numpy()
        n = len(ids)
        if n < 2:
            return pd.DataFrame(
                {"query_id": [], "cell": [], "neighbor_id": [], "cosine": []}
            )
        mat = np.array(list(pdf["qvec"]), dtype=np.int64)
        norms = np.sqrt((mat * mat).sum(axis=1).astype(np.float64))
        ok = norms > 0  # the column impl's zero-norm exclusion
        if not ok.all():
            pdf, ids, mat, norms = pdf[ok], ids[ok], mat[ok], norms[ok]
            n = len(ids)
            if n < 2:
                return pd.DataFrame(
                    {"query_id": [], "cell": [], "neighbor_id": [],
                     "cosine": []}
                )
        sims = _np_round6(
            (mat @ mat.T).astype(np.float64) / np.outer(norms, norms)
        )
        np.fill_diagonal(sims, -np.inf)
        order = np.argsort(-sims, axis=1, kind="stable")[:, : min(k, n - 1)]
        nq, kk = order.shape
        return pd.DataFrame(
            {
                "query_id": np.repeat(ids, kk),
                "cell": np.repeat(pdf[cell_col].to_numpy(), kk),
                "neighbor_id": ids[order.ravel()],
                "cosine": np.take_along_axis(sims, order, axis=1).ravel(),
            }
        )

    return (
        qdf.select(id_col, cell_col, "qvec")
        .groupBy(cell_col)
        .applyInPandas(score_cell, out_schema)
    )
