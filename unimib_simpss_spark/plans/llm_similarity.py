"""Similarity-search queries over ``embeddings`` (SURVEY.md §2.7 [EXT]).

Three paths from :mod:`unimib_simpss_spark.operators.similarity`:
brute-force cosine top-k (broadcast queries × corpus, exact baseline),
IVF cell-probed top-k (equi-join on coarse cell — the 100 TB path), and
an Arrow/NumPy ``mapInPandas`` variant of brute force (GEMM per batch,
the bench path). The Arrow variant shares the brute-force oracle: same
contract, different physical plan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from unimib_simpss_spark.catalog import load_table
from unimib_simpss_spark.operators import similarity as S
from unimib_simpss_spark.plans.registry import query

_QUERY_PRED_SQL = "vec_id < 8"


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


def _cosine_topk_union_oracle() -> str:
    leg = S.cosine_topk_sql(k=5, query_pred_sql=_QUERY_PRED_SQL)
    # 'quant' leg: the SAME top-k SQL over the int8 round-tripped
    # vectors — the quantized relation CTE-SHADOWS the embeddings view
    # inside the subquery, so the oracle text is reused verbatim
    qemb = S.quantized_embeddings_sql(pred_sql=S.defined_vector_sql())
    # 'sq8' leg: scored IN the int8 domain (no dequantize anywhere)
    sq8 = S.cosine_topk_quantized_sql(
        k=5, query_pred_sql=_QUERY_PRED_SQL, pred_sql=S.defined_vector_sql()
    )
    return f"""
    SELECT 'hof' AS method, * FROM ({leg})
    UNION ALL
    SELECT 'arrow' AS method, * FROM ({leg})
    UNION ALL
    SELECT 'quant' AS method, * FROM (
        WITH embeddings AS ({qemb})
        SELECT * FROM ({leg})
    )
    UNION ALL
    SELECT 'sq8' AS method, * FROM ({sq8})
    """


@query("q36_cosine_topk", oracle=_cosine_topk_union_oracle())
def q36_cosine_topk(
    spark: SparkSession, sf_dir: str, sections=None
) -> DataFrame:
    """Exact brute-force cosine top-5 for 8 query vectors, run through
    BOTH physical implementations and tagged by method: the JVM
    higher-order-function plan ('hof') and the Arrow/NumPy GEMM
    ``mapInPandas`` plan ('arrow'). Same contract, so the oracle is the
    same top-k SQL twice — this doubles as an engine-level cross-check
    that the two plans agree bit-for-bit. (Merged from the former
    q36/q38 to fit the driver's 50-query verification window.)

    The 'quant' leg runs the SAME top-k over int8 quantize→dequantize
    round-tripped vectors (similarity.py: quantize_vectors — the 4-8×
    embedding-storage trade at 100 TB), oracle-paired through the same
    SQL with the quantized relation shadowing the embeddings view:
    the quantization ERROR itself is hash-checked, engine-identically,
    and the leg doubles as the end-to-end proof that stored-int8
    corpora plug into the unmodified operators. Corrupt vectors
    pre-drop via the shared defined-vector gate (round(NaN) casts
    differently across engines).

    The 'sq8' leg closes the quantization story: the SAME top-k scored
    DIRECTLY on the stored tinyint arrays (integer dot and norms —
    similarity.cosine_topk_quantized; the scales cancel in cosine), so
    the 4-8× bandwidth saving reaches the scoring kernel instead of
    being repaid by a dequantize pass — oracle-paired against the
    identical integer-domain arithmetic in DuckDB.

    ``sections`` builds ONLY the named legs (bench per-leg walls):
    q36's legs run eager driver jobs at plan-CONSTRUCTION time (the
    arrow leg's bounded query collect, each Column leg's size-gate
    count), so the bench filter fallback would charge every leg wall
    a constant multi-job overhead from the pruned branches (review
    r17 pass 2) — exactly the contamination the sq8 wall exists to
    rule out."""
    from unimib_simpss_spark.plans.registry import pick_sections

    want = pick_sections(sections, ("hof", "arrow", "quant", "sq8"))
    emb = _emb(spark, sf_dir)

    # each leg's construction runs its own small eager jobs (size-gate
    # counts, the arrow leg's query collect) — overlap them on a pool
    # (guide §2.6, the q61/q62 discipline); the union below preserves
    # the hof/arrow/quant/sq8 leg order
    def _build_quant_legs():
        qz = S.quantize_vectors(
            emb.where(S.defined_vector_pred()), keep=("label",)
        )
        out = []
        if "quant" in want:
            qemb = S.dequantize_vectors(qz, keep=("label",))
            out.append(
                S.cosine_topk(
                    qemb, k=5, query_pred=F.col("vec_id") < 8
                ).select(F.lit("quant").alias("method"), "*")
            )
        if "sq8" in want:
            out.append(
                S.cosine_topk_quantized(
                    qz, k=5, query_pred=F.col("vec_id") < 8
                ).select(F.lit("sq8").alias("method"), "*")
            )
        return out

    from concurrent.futures import ThreadPoolExecutor

    f_hof = f_arrow = f_qz = None
    with ThreadPoolExecutor(max_workers=3) as pool:
        if "hof" in want:
            f_hof = pool.submit(
                S.cosine_topk, emb, k=5, query_pred=F.col("vec_id") < 8
            )
        if "arrow" in want:
            f_arrow = pool.submit(
                S.cosine_topk_pandas,
                emb,
                k=5,
                query_pred=F.col("vec_id") < 8,
            )
        if want & {"quant", "sq8"}:
            f_qz = pool.submit(_build_quant_legs)
    legs = []
    if f_hof is not None:
        legs.append(f_hof.result().select(F.lit("hof").alias("method"), "*"))
    if f_arrow is not None:
        legs.append(
            f_arrow.result().select(F.lit("arrow").alias("method"), "*")
        )
    if f_qz is not None:
        legs.extend(f_qz.result())
    u = legs[0]
    for leg in legs[1:]:
        u = u.unionAll(leg)
    return u


def _q37_oracle() -> str:
    ivf = S.ivf_topk_sql(k=3)
    mrl = S.prefix_rerank_topk_sql(
        k=3, probe_dims=16, shortlist=32, query_pred_sql=_QUERY_PRED_SQL
    )
    return f"""
    SELECT 'ivf' AS method, query_id, CAST(cell AS VARCHAR) AS cell,
           neighbor_id, cosine,
           CAST(NULL AS BIGINT) AS rank
    FROM ({ivf})
    UNION ALL
    SELECT 'mrl' AS method, query_id, CAST(NULL AS VARCHAR) AS cell,
           neighbor_id, cosine, rank
    FROM ({mrl})
    """


@query("q37_ivf_topk", oracle=_q37_oracle())
def q37_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN scale paths, tagged by method:

    - 'ivf': top-3 neighbors within each vector's coarse cell (the
      cluster-structured path — cell equi-join replaces the cross
      join).
    - 'mrl': two-stage prefix-dims rerank for 8 query vectors
      (operators/similarity.py prefix_rerank_topk — the
      Matryoshka-style coarse-to-fine path when NO cluster structure
      exists: stage 1 scans the corpus at 16 of 64 dims and keeps a
      32-deep shortlist, stage 2 exact-reranks only the shortlist
      rows at full width). Deterministic by construction (both
      stages order by rounded-cosine desc, id asc), so the whole
      two-stage pipeline is oracle-paired, not just recall-tested.
    """
    emb = _emb(spark, sf_dir)
    ivf = S.ivf_topk(emb, k=3).select(
        F.lit("ivf").alias("method"),
        "query_id",
        # string cell on both legs AND both oracle legs: the mrl
        # section has no cell, and a union must hold one type
        F.col("cell").cast("string").alias("cell"),
        "neighbor_id",
        "cosine",
        F.lit(None).cast("long").alias("rank"),
    )
    mrl = S.prefix_rerank_topk(
        emb, k=3, probe_dims=16, shortlist=32,
        query_pred=F.col("vec_id") < 8,
    ).select(
        F.lit("mrl").alias("method"),
        "query_id",
        F.lit(None).cast("string").alias("cell"),
        "neighbor_id",
        "cosine",
        "rank",
    )
    return ivf.unionAll(mrl)


def _cosine_pairs_semdedup_oracle() -> str:
    pairs = S.cosine_pairs_sql(threshold=0.35)
    hardneg = S.hard_negatives_sql(k=3, anchor_pred_sql="vec_id % 20 = 0")
    return f"""
    WITH pairs AS ({pairs})
    SELECT 'pairs' AS section, vec1, vec2, cell, cosine,
           CAST(NULL AS BIGINT) AS rank
    FROM pairs
    UNION ALL
    SELECT 'drop' AS section,
           min(vec1) AS vec1, vec2, cell, max(cosine) AS cosine,
           CAST(NULL AS BIGINT) AS rank
    FROM pairs GROUP BY cell, vec2
    UNION ALL
    SELECT 'hardneg' AS section, anchor_id AS vec1, negative_id AS vec2,
           neg_label AS cell, cosine, rank
    FROM ({hardneg})
    """


@query("q46_embedding_cosine_pairs", oracle=_cosine_pairs_semdedup_oracle())
def q46_embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup mining AND the SemDeDup pruning
    decision it feeds, tagged by section:

    - 'pairs' — all within-cell pairs with cosine ≥ 0.35 (cell-scoped
      GEMM, :func:`operators.similarity.cosine_pairs`).
    - 'drop' — the semantic-dedup verdict (SemDeDup shape — Abbas et
      al. 2023, "SemDeDup: Data-Efficient Learning at Web-Scale Through
      Semantic Deduplication": cluster embeddings, drop all but one of
      each within-cluster near-dup set): a vector is dropped when a
      LOWER-id vector sits within the threshold in its cell — vec2 =
      dropped id, vec1 = the lowest-id survivor it dedupes against,
      cosine = strongest evidence. Deterministic keep-lowest-id policy,
      so the kept set is rerun-stable.
    - 'hardneg' — contrastive-training negative mining: for every 20th
      vector as anchor, the top-3 most-cosine-similar CROSS-label
      vectors — vec1 = anchor, vec2 = negative, cell = the NEGATIVE's
      label, rank = 1..3 (NULL in the other sections). Runs the Arrow
      GEMM twin (operators/similarity.py hard_negatives_pandas —
      identical contract to hard_negatives, pytest-pinned row-for-row;
      the HOF form's interpreted per-pair fold was this query's
      dominant bench cost), with per-batch partial top-k so the window
      sees anchors × k × batches rows, not anchors × corpus.

    The pair relation is computed ONCE behind cache_intermediate (so
    the "table" checkpoint mode covers the barrier), the 'pairs' and
    'drop' legs derive from it, and the three-leg union is checkpointed
    + the cache released before returning (operators/caching.py
    contract). The 'drop' leg adds one combinable groupBy over the
    (small) pair relation; the 'hardneg' leg is a cap-gated broadcast
    anchor set against one corpus stream."""
    from unimib_simpss_spark.operators.caching import (
        cache_intermediate,
        materialize_release,
    )

    emb = _emb(spark, sf_dir)
    # cache_intermediate (not a raw persist) so the "table" checkpoint
    # mode covers this barrier too — same routing as q34/q62
    pairs = cache_intermediate(S.cosine_pairs(emb, threshold=0.35))
    pleg = pairs.select(
        F.lit("pairs").alias("section"),
        "vec1",
        "vec2",
        "cell",
        "cosine",
        F.lit(None).cast("long").alias("rank"),
    )
    drops = (
        pairs.groupBy("cell", "vec2")
        .agg(F.min("vec1").alias("vec1"), F.max("cosine").alias("cosine"))
        .select(
            F.lit("drop").alias("section"),
            "vec1",
            "vec2",
            "cell",
            "cosine",
            F.lit(None).cast("long").alias("rank"),
        )
    )
    hn = S.hard_negatives_pandas(
        emb, k=3, anchor_pred=F.col("vec_id") % 20 == 0
    ).select(
        F.lit("hardneg").alias("section"),
        F.col("anchor_id").alias("vec1"),
        F.col("negative_id").alias("vec2"),
        F.col("neg_label").alias("cell"),
        "cosine",
        "rank",
    )
    return materialize_release(pleg.unionAll(drops).unionAll(hn), pairs)


@query("x50_ann_learned_index")  # iterative build + approx recall → rows-only
def x50_ann_learned_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LEARNED-index ANN paths in one tagged union (merged from the
    former x50/x51 so every rows-only query fits the driver's 50-query
    verification window):

    - 'ivf_kmeans': build the coarse quantizer with distributed Lloyd
      k-means, then cell-probed top-3 over the LEARNED cells (instead
      of the precomputed label column q37 uses).
    - 'lsh': random-hyperplane LSH cosine ANN (6 planes × 12 tables) —
      bucket equi-join candidates, exact cosine within buckets. Recall
      is bounds-tested against brute force in tests/test_llm_ops.py.
    - 'pca_ivf': the end-to-end dimensionality-reduced index — PCA fit
      (pca_model), map-only projection 64→16 (pca_project), THEN the
      same k-means + cell-probed top-3 entirely in the reduced space.
      Every post-projection scan touches 16 doubles per vector instead
      of 64 — the d/k scan-width claim, recall-bounds-tested against
      the raw-dimension run on a low-rank corpus in
      tests/test_llm_ops.py (these isotropic synthetic embeddings are
      the no-structure worst case, so the leg here proves plumbing and
      determinism, not recall).

    The union is checkpointed and the legs' internal checkpoints
    released before returning — release_result on a lazy union cannot
    reach the children's blocks (the composition-leak case the
    registry-level sweep in tests/test_cache_hygiene.py guards).
    """
    from unimib_simpss_spark.operators.caching import (
        materialize_release,
        release_result,
    )

    emb = _emb(spark, sf_dir)
    cells = S.kmeans_cells(emb, k=8, iters=3)
    indexed = emb.join(cells, "vec_id").withColumn("cell", F.col("cell"))
    ivf = S.ivf_topk(indexed, k=3, cell_col="cell").select(
        F.lit("ivf_kmeans").alias("method"),
        "query_id",
        F.col("cell").cast("long").alias("cell"),
        "neighbor_id",
        "cosine",
        F.lit(None).cast("long").alias("rank"),
    )
    lsh_raw = S.hyperplane_lsh_topk(emb, k=5, n_planes=6, n_tables=12)
    lsh = lsh_raw.select(
        F.lit("lsh").alias("method"),
        "query_id",
        F.lit(None).cast("long").alias("cell"),
        "neighbor_id",
        "cosine",
        "rank",
    )
    mean, _, comps = S.pca_model(emb, n_components=16)
    red = S.pca_project(emb, mean, comps)
    rcells = S.kmeans_cells(red, k=8, iters=3, vec_col="reduced")
    rindexed = red.join(rcells, "vec_id")
    pca_ivf = S.ivf_topk(rindexed, k=3, vec_col="reduced", cell_col="cell").select(
        F.lit("pca_ivf").alias("method"),
        "query_id",
        F.col("cell").cast("long").alias("cell"),
        "neighbor_id",
        "cosine",
        F.lit(None).cast("long").alias("rank"),
    )
    out = materialize_release(ivf.unionAll(lsh).unionAll(pca_ivf))
    release_result(cells)
    release_result(lsh_raw)
    release_result(rcells)
    return out


def _q57_oracle() -> str:
    return f"""
    -- + 0 normalizes DuckDB's -0.0 (round of a tiny negative mean over
    -- signed components) to +0.0; Spark's BigDecimal round can't
    -- produce -0.0, and the sorted-row hash compare distinguishes them
    WITH q AS ({S.label_silhouette_sql()})
    SELECT 'centroid' AS section, label, pos,
           round(avg(v), 5) + 0 AS val, CAST(NULL AS BIGINT) AS n
    FROM (
        SELECT label,
               unnest(embedding)                          AS v,
               unnest(range(1, len(embedding) + 1))       AS pos
        FROM embeddings
        -- same defined-vector gate as the silhouette sections (review
        -- r13 pass 2): a NULL embedding would crash the Spark grouped
        -- UDF while unnest(NULL) silently skips it, and a NULL element
        -- would NaN-poison np column means where avg() skips
        WHERE {S.defined_vector_sql()} AND label IS NOT NULL
    )
    GROUP BY label, pos
    UNION ALL
    -- explicit three-way unpivot, NOT the UNPIVOT clause: UNPIVOT
    -- drops NULL values by default, so a single-label corpus (min_sep
    -- NULL by design) would lose its 'sep' row while the Spark leg
    -- emits it (review r13)
    SELECT s AS section, label, CAST(NULL AS BIGINT) AS pos, val, n
    FROM (
        SELECT label, n, 'sil' AS s, mean_silhouette AS val FROM q
        UNION ALL SELECT label, n, 'intra', mean_intra FROM q
        UNION ALL SELECT label, n, 'sep', min_sep FROM q
    )
    """


@query("q57_label_centroids", oracle=_q57_oracle())
def q57_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding diagnostics, two sections over one corpus:

    - 'centroid': per-label centroid via a GROUPED-AGG pandas UDF (the
      UDAF shape of SURVEY §2.7): one Arrow batch per label feeds a
      single NumPy column-mean — the vectorized custom aggregate
      pattern, emitted long-form (label, pos, val) so the oracle
      compares element-wise. Grouped-agg state is one k×d float64
      accumulator per group; the only shuffle is the groupBy(label).
    - 'sil' / 'intra' / 'sep': the label-quality gate
      (operators/similarity.py label_silhouette) — centroid
      silhouette (O(n·k), never O(n²) pairwise), cluster radius, and
      nearest-other-centroid separation per label; n = label size on
      each of these rows. The corpus streams once through an Arrow
      pass against the bounded broadcast centroid matrix — no corpus
      shuffle (the assign_cells pattern)."""

    # Type-hint form (pd.Series -> scalar-per-group infers GROUPED_AGG);
    # the PandasUDFType enum emitted a SPARK-28264 deprecation warning
    # on every run. ``pd``/``np`` must be module-level for the string
    # annotations (future-import) to resolve at decoration time.
    @F.pandas_udf("array<double>")
    def centroid(emb: pd.Series) -> list:
        return np.stack(emb.to_numpy()).astype("float64").mean(axis=0).tolist()

    e = _emb(spark, sf_dir)
    cent = (
        e.where(
            S.defined_vector_pred("embedding")
            & F.col("label").isNotNull()
        )
        .groupBy("label")
        .agg(centroid(F.col("embedding")).alias("centroid"))
        .select("label", F.posexplode("centroid").alias("pos0", "v"))
        .select(
            F.lit("centroid").alias("section"),
            "label",
            (F.col("pos0") + 1).cast("bigint").alias("pos"),
            F.round("v", 5).alias("val"),
            F.lit(None).cast("long").alias("n"),
        )
    )
    # unpivot via one explode, not three self-unions — the silhouette
    # relation is tiny but each union leg would re-run its corpus scan
    qual = S.label_silhouette(e).select(
        "label",
        "n",
        F.explode(
            F.array(
                *(
                    F.struct(
                        F.lit(tag).alias("section"),
                        F.col(col).alias("val"),
                    )
                    for tag, col in (
                        ("sil", "mean_silhouette"),
                        ("intra", "mean_intra"),
                        ("sep", "min_sep"),
                    )
                )
            )
        ).alias("e"),
    ).select(
        F.col("e.section").alias("section"),
        "label",
        F.lit(None).cast("long").alias("pos"),
        F.col("e.val").alias("val"),
        "n",
    )
    return cent.unionAll(qual)


@query("x66_pq_topk")  # sample-trained codebooks + approx ADC → rows-only
def x66_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN, both index layouts in one tagged union:

    - 'pq': flat PQ — sample-trained codebooks (16 subspaces × 16
      centroids → 16-byte codes, 16× smaller than float32), map-only
      corpus encode, LUT-gather asymmetric-distance shortlist of 25,
      exact re-rank to top-5 (recall@5 ≈ 0.83 vs exact L2).
    - 'ivfpq': the composed FAISS-style IVF-PQ — learned coarse
      quantizer prunes the scan to nprobe=4 of 8 cells per query, PQ
      scores the survivors, exact refine (recall@5 ≈ 0.8-0.87 while
      scanning half the corpus).

    Both bounds-tested in tests/test_llm_ops.py. The ivfpq leg is an
    eager self-owned checkpoint (its cells released internally), so the
    union is checkpointed and the leg handle freed before returning —
    the composition-leak guard the cache-hygiene sweep asserts.

    The PQ codebooks are trained ONCE (pq_codebooks) and passed to both
    legs — they share the same corpus sample, so training twice only
    duplicated the hash-ordered sort/collect and the per-subspace
    k-means loops (round-6 advice)."""
    from unimib_simpss_spark.operators.caching import (
        materialize_release,
        release_result,
    )

    emb = _emb(spark, sf_dir)
    pred = F.col("vec_id") < 6
    books = S.pq_codebooks(emb, m=16, ksub=16)
    pq = S.pq_topk(
        emb, k=5, query_pred=pred, m=16, ksub=16, refine=25, codebooks=books
    ).select(
        F.lit("pq").alias("method"), "query_id", "neighbor_id", "d2", "rank"
    )
    ivfpq_raw = S.ivfpq_topk(
        emb, k=5, query_pred=pred, n_cells=8, nprobe=4, m=16, ksub=16,
        refine=25, codebooks=books,
    )
    ivfpq = ivfpq_raw.select(
        F.lit("ivfpq").alias("method"), "query_id", "neighbor_id", "d2", "rank"
    )
    out = materialize_release(pq.unionAll(ivfpq))
    release_result(ivfpq_raw)
    return out


@query("x76_hardneg_ivf")  # learned quantizer + approx recall → rows-only
def x76_hardneg_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-ROUTED hard-negative mining (operators/similarity.py
    hard_negatives_ivf) — the scale path behind q46's exact 'hardneg'
    section: the SAME anchor set (every 20th vector) routed through a
    learned 8-cell quantizer probing its 2 nearest cells per anchor,
    instead of the cap-gated broadcast × corpus cross join. At 100×
    the corpus the exact form raises by its own bounded-driver guard;
    this plan's anchor side is never broadcast and never capped —
    cost ∝ anchors × nprobe × cell size, co-partitioned on cell.

    Rows-only: the quantizer is an iterative k-means fit and the
    result is approximate (recall vs the exact baseline — and EXACT
    equality at nprobe = n_cells — are bounds-tested in
    tests/test_llm_ops.py). Deterministic end to end (seeded quantizer,
    rounded-distance tie policy), so the run-determinism sweep covers
    it.

    The routed path's QUALITY is emitted as data, not just asserted in
    pytest (VERDICT r12 #6, the x74 pattern): section='pairs' rows are
    the routed output; section='recall' rows carry per-anchor
    hits/total/recall vs the exact baseline on the same (cap-fitting)
    anchor set — the exact twin is the Arrow GEMM form
    (hard_negatives_pandas, row-identical to the Column form), so the
    baseline costs one corpus stream, never an interpreted cross join.
    The determinism sweep therefore pins the routed path's recall
    numbers across runs, not merely its stability."""
    from unimib_simpss_spark.operators.caching import (
        cache_intermediate,
        materialize_release,
    )

    emb = _emb(spark, sf_dir)
    pred = F.col("vec_id") % 20 == 0
    routed = cache_intermediate(S.hard_negatives_ivf(
        emb, k=3, anchor_pred=pred, n_cells=8, nprobe=2
    ))
    exact = cache_intermediate(S.hard_negatives_pandas(
        emb, k=3, anchor_pred=pred
    ))
    ex = exact.select("anchor_id", "negative_id")
    hits = (
        ex.join(
            routed.select("anchor_id", "negative_id"),
            ["anchor_id", "negative_id"],
            "left_semi",
        )
        .groupBy("anchor_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    total = ex.groupBy("anchor_id").agg(F.count(F.lit(1)).alias("total"))
    _null = lambda t, name: F.lit(None).cast(t).alias(name)  # noqa: E731
    recall = (
        total.join(hits, "anchor_id", "left")
        .select(
            F.lit("recall").alias("section"),
            "anchor_id",
            _null("long", "negative_id"),
            _null("int", "neg_label"),
            _null("double", "cosine"),
            _null("long", "rank"),
            F.coalesce("hits", F.lit(0)).alias("hits"),
            "total",
            F.round(
                F.coalesce("hits", F.lit(0)) / F.col("total"), 6
            ).alias("recall"),
        )
    )
    pairs = routed.select(
        F.lit("pairs").alias("section"),
        "anchor_id",
        "negative_id",
        "neg_label",
        "cosine",
        "rank",
        _null("long", "hits"),
        _null("long", "total"),
        _null("double", "recall"),
    )
    return materialize_release(pairs.unionAll(recall), routed, exact)


@query("x69_pca_spectrum")  # iterative eigendecomposition → rows-only
def x69_pca_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA over the embedding corpus (operators/similarity.py
    pca_model): the top-16 population-covariance eigenvalues with
    cumulative explained-variance share — the dimensionality-reduction
    diagnostic an ANN pipeline reads before deciding how hard it can
    compress (project, then feed IVF/LSH/PQ at d/k scan width).
    Rows-only: the fit is a partition-wise associative Gram
    accumulation + driver eigendecomposition, not SQL-expressible;
    orthonormality, spectrum ordering, reconstruction bounds, and
    bit-determinism are property-tested in tests/test_llm_ops.py."""
    import numpy as np

    from unimib_simpss_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    _, evals, _ = S.pca_model(emb, n_components=16)
    cum = np.cumsum(evals)
    rows = [
        (int(i + 1), round(float(v), 6), round(float(c), 6))
        for i, (v, c) in enumerate(zip(evals, cum))
    ]
    return spark.createDataFrame(
        rows, "component int, eigenvalue double, cum_eigenvalue double"
    )


@query("x79_ivf_sq8")  # learned quantizer + approx recall → rows-only
def x79_ivf_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF,SQ8 — the composed FAISS serving combo (VERDICT r15 #5):
    the corpus INT8-quantized (quantize_vectors), cell-structured by a
    learned 8-cell k-means coarse quantizer (the x50 recipe), and
    searched with the in-cell scoring in the INTEGER DOMAIN
    (operators/similarity.py ivf_topk_quantized — the SAME int8
    kernel q36's 'sq8' leg oracle-pairs, now inside the cells where
    the all-pairs work actually happens). At 100 TB this is the
    vector-serving shape: 4-8× less corpus bandwidth AND ~C× fewer
    compared pairs, co-partitioned on the cell id.

    Quality is emitted as data, not just asserted (the x76 pattern):
    section='pairs' rows are the full IVF,SQ8 top-3; section='recall'
    rows carry per-query hits/total/recall for a bounded query subset
    (every 17th vector) against the EXACT float brute-force baseline
    (cosine_topk_pandas — the Arrow GEMM twin, row-identical to the
    Column form), so the determinism sweep re-pins the composed
    path's recall every round. Rows-only: k-means is iterative and
    the cell pruning approximate; in-cell ranking parity with the
    dequantized path is pytest-pinned in tests/test_llm_ops.py."""
    from unimib_simpss_spark.operators.caching import (
        cache_intermediate,
        materialize_release,
        release_result,
    )

    # gate corrupt rows BEFORE quantizing/indexing (quantize_vectors'
    # documented contract; a NULL-element embedding would produce a
    # NULL qvec that crashes the per-cell GEMM — review r16 pass 2)
    # AND exclude zero-norm vectors: the quantized path drops them
    # (no cosine direction) while the float baseline would keep them
    # with NaN cosines, corrupting the recall leg (review r16 pass 3)
    emb = _emb(spark, sf_dir).where(S.defined_vector_pred())
    emb = emb.where(S._norm(F.col("embedding").cast("array<double>")) > 0)
    cells = S.kmeans_cells(emb, k=8, iters=3)
    qz = S.quantize_vectors(emb).join(cells, "vec_id")
    routed = cache_intermediate(
        S.ivf_topk_quantized(qz, k=3, cell_col="cell")
    )
    pred = F.col("vec_id") % 17 == 0
    exact = cache_intermediate(
        S.cosine_topk_pandas(emb, k=3, query_pred=pred)
    )
    _null = lambda t, name: F.lit(None).cast(t).alias(name)  # noqa: E731
    ex = exact.select("query_id", "neighbor_id")
    hits = (
        ex.join(
            routed.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_semi",
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    total = ex.groupBy("query_id").agg(F.count(F.lit(1)).alias("total"))
    recall = total.join(hits, "query_id", "left").select(
        F.lit("recall").alias("section"),
        "query_id",
        _null("long", "cell"),
        _null("long", "neighbor_id"),
        _null("double", "cosine"),
        F.coalesce("hits", F.lit(0)).alias("hits"),
        "total",
        F.round(F.coalesce("hits", F.lit(0)) / F.col("total"), 6).alias(
            "recall"
        ),
    )
    pairs = routed.select(
        F.lit("pairs").alias("section"),
        "query_id",
        F.col("cell").cast("long").alias("cell"),
        "neighbor_id",
        "cosine",
        _null("long", "hits"),
        _null("long", "total"),
        _null("double", "recall"),
    )
    out = materialize_release(pairs.unionAll(recall), routed, exact)
    release_result(cells)  # the quantizer's checkpoint is spent
    return out
