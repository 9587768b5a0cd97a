"""Document deduplication operators for LLM-data pipelines.

Six families, each designed for 100 TB (no driver-side collect, no
all-pairs comparison except inside LSH buckets):

- **exact**: hash-groupBy on normalized text — one shuffle.
- **fingerprint**: hash-groupBy on the sorted distinct token set —
  catches word-order/multiplicity shuffles; one shuffle.
- **n-gram Jaccard**: posting-list self-join on shingles (candidate pairs
  share ≥1 shingle — the exact inverted-index formulation), then exact
  Jaccard filter. Shuffles on shingle then on pair.
- **MinHash + LSH**: 16 permutations, 4 bands × 4 rows; band-bucket join
  produces candidates, exact Jaccard verifies. The sub-quadratic scale
  path: cost ∝ documents + collisions, never pairs.
- **SimHash**: 32-bit signature over shingle hashes; pairs via pigeonhole
  band join (hamming ≤ 3 ⇒ one of 4 bytes equal — EXACT, not
  approximate), verified by bit_count(xor).
- **edit distance**: positional prefix-filtered q-gram candidates +
  banded levenshtein verify — the entity-resolution / fuzzy-key join,
  exact at every string length.

Every operator has a DuckDB-oracle twin generated from the SAME constants
(``*_sql``), so correctness is checked bit-for-bit.

Embedding-cosine near-dup lives in operators/similarity.py.
"""

from __future__ import annotations

import functools
import operator as _op

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from unimib_simpss_spark.functions.hashing import COMBO_BASE, MERSENNE_31
from unimib_simpss_spark.operators.caching import (
    cache_intermediate,
    checkpoint_result,
    materialize_release,
    release_intermediate,
    release_result,
)
from unimib_simpss_spark.functions.text import (
    combo_shingle_hashes_sql,
    normalized_text,
    normalized_text_sql,
    shingles_from_tokens,
    shingles_sql,
    token_fingerprint,
    token_fingerprint_sql,
    tokens,
)

# ---------------------------------------------------------------- constants
MINHASH_K = 16
MINHASH_BANDS = 4
MINHASH_ROWS = MINHASH_K // MINHASH_BANDS
# Deterministic universal-hash coefficients (a*h + b) mod 2^31-1.
MINHASH_COEFFS: list[tuple[int, int]] = [
    (
        (1103515245 * (i + 1) + 12345) % MERSENNE_31 or 1,
        (2654435761 * i + 1013904223) % MERSENNE_31,
    )
    for i in range(MINHASH_K)
]
SIMHASH_BITS = 32
SIMHASH_BAND_BITS = 8
SIMHASH_N_BANDS = SIMHASH_BITS // SIMHASH_BAND_BITS


# -------------------------------------------------------------- exact dedup
def exact_dedup_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: group by md5 of normalized text; keep min id."""
    return (
        docs.select(F.md5(normalized_text(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def exact_dedup_sql(text_expr: str = "text", id_expr: str = "doc_id") -> str:
    return f"""
    SELECT md5({normalized_text_sql(text_expr)}) AS text_hash,
           min({id_expr}) AS keep_id, count(*) AS n_copies
    FROM documents GROUP BY 1
    """


def fingerprint_dedup_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token-set fingerprint dedup: catches shuffled/reordered copies."""
    return (
        docs.select(token_fingerprint(text_col).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .where(F.col("n_copies") > 1)
    )


def fingerprint_dedup_sql(text_expr: str = "text", id_expr: str = "doc_id") -> str:
    return f"""
    SELECT {token_fingerprint_sql(text_expr)} AS fingerprint,
           min({id_expr}) AS keep_id, count(*) AS n_copies
    FROM documents GROUP BY 1 HAVING count(*) > 1
    """


# ----------------------------------------------------- n-gram Jaccard pairs
def _tokenized_docs(
    docs: DataFrame, text_col: str, id_col: str, min_tokens: int = 3
) -> DataFrame:
    """(doc_id, tk): the shared first stage of every shingle relation.

    Three deliberate plan choices (each measured at sf0.1):

    - the short-doc filter tests ``tokens()`` BEFORE the shuffle — a
      filter placed above a projection gets predicate-pushed with its
      alias substituted, so guarding on the hashed/shingled array would
      re-derive that whole array per row just to test its length;
    - the input is repartitioned by id so the downstream per-row
      compute parallelizes even off single-split files;
    - ``tokens()`` is projected into a bound column so downstream
      per-position shingle lambdas reference an attribute, not an
      expression (see ``shingles_from_tokens``'s perf contract —
      an expression there re-tokenizes once per shingle position).
    """
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text"))
        .where(F.size(tokens("_text")) >= min_tokens)
        .repartition("doc_id")
        .select("doc_id", tokens("_text").alias("tk"))
    )


def _shingle_docs(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, sg) with empty-shingle docs dropped (min-token filter ⇔
    non-empty shingles). The result is persisted by callers that branch
    over it (posting list + both sides of the verify join) so the
    shingling runs exactly once."""
    return _tokenized_docs(docs, text_col, id_col).select(
        "doc_id", shingles_from_tokens(F.col("tk")).alias("sg")
    )


def _pair_jaccard(pairs: DataFrame, sh: DataFrame) -> DataFrame:
    """Attach exact shingle-set Jaccard to (doc1, doc2) candidate pairs."""
    a = sh.select(F.col("doc_id").alias("doc1"), F.col("sg").alias("sg1"))
    b = sh.select(F.col("doc_id").alias("doc2"), F.col("sg").alias("sg2"))
    inter = F.size(F.array_intersect("sg1", "sg2"))
    return (
        pairs.join(a, "doc1")
        .join(b, "doc2")
        .select(
            "doc1",
            "doc2",
            F.round(
                inter.cast("double")
                / (F.size("sg1") + F.size("sg2") - inter),
                6,
            ).alias("jaccard"),
        )
    )


def _combo_shingle_docs(
    docs: DataFrame | None,
    text_col: str,
    id_col: str,
    toks: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, sz, hs): the pair miners' shared shingle-hash relation.

    One md5 per TOKEN (reduced mod 2^31-1), 3-gram hashes composed by
    Horner's rule — integer ops only, no shingle strings ever built:
    ~5× faster to compute AND to columnar-cache than md5-per-shingle.
    Arithmetic is mirrored exactly by
    ``functions.text.combo_shingle_hashes_sql`` so the DuckDB oracles
    operate in the IDENTICAL hash space (collisions, ~n²/2³¹, are
    in-spec: both engines agree bit-for-bit). jaccard_pairs and
    minhash_dedup_pairs build this same logical plan, so one persisted
    copy serves both in a shared session (CacheManager plan matching).

    ``toks`` accepts a prebuilt (ideally cached) ``(doc_id, tk)``
    token relation covering ALL docs — a host whose other legs also
    tokenize (q61's bloom fingerprint) hoists ONE tokenize and this
    derivation applies ``_tokenized_docs``' min-token filter itself
    (``size(tk) >= 3`` over the bound attribute: no re-tokenize,
    3-gram shingling needs 3 tokens)."""
    tok_src = (
        toks.where(F.size("tk") >= 3).select("doc_id", "tk")
        if toks is not None
        else _tokenized_docs(docs, text_col, id_col)
    )
    tok_h = tok_src.select(
        "doc_id",
        F.transform(
            F.col("tk"),
            lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
            % MERSENNE_31,
        ).alias("th"),
    )
    th = F.col("th")
    b, p = COMBO_BASE, MERSENNE_31
    comb = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(th) - 2),
            lambda i: (
                (F.element_at(th, i) * b + F.element_at(th, i + 1)) % p * b
                + F.element_at(th, i + 2)
            )
            % p,
        )
    )
    return tok_h.select("doc_id", comb.alias("hs")).select(
        "doc_id", F.size("hs").alias("sz"), "hs"
    )


def _pair_jaccard_hashed(pairs: DataFrame, hsd: DataFrame) -> DataFrame:
    """Jaccard over hashed shingle sets for (doc1, doc2) pairs."""
    a = hsd.select(
        F.col("doc_id").alias("doc1"), F.col("sz").alias("sz1"), F.col("hs").alias("h1")
    )
    b = hsd.select(
        F.col("doc_id").alias("doc2"), F.col("sz").alias("sz2"), F.col("hs").alias("h2")
    )
    inter = F.size(F.array_intersect("h1", "h2"))
    return (
        pairs.join(a, "doc1")
        .join(b, "doc2")
        .select(
            "doc1",
            "doc2",
            F.round(
                inter.cast("double") / (F.col("sz1") + F.col("sz2") - inter), 6
            ).alias("jaccard"),
        )
    )


def jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    verify_on: str = "hash",
    _hsd: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs via prefix-filtered inverted-index join + exact
    Jaccard ≥ threshold. Exact answer (prefix pruning is PPJoin-style
    and loses no pairs):

    - **prefix filter**: order each shingle set by a global total order
      (here: md5 hash value — computed array-side, NO frequency table,
      no extra shuffle or window) and index only the first
      ``|X| - floor(t*|X|) + 1`` entries; J(A,B) ≥ t pairs must
      collide inside both prefixes (floor, not ceil: conservative
      under float t).
    - **length filter**: J(A,B) ≥ t ⇒ t*|B| ≤ |A| — join pruned on
      sizes before the pair is ever materialized.
    - joining on the 60-bit hash (not the string) shrinks shuffle rows;
      a collision can only ADD a candidate.

    ``verify_on='hash'`` (default) verifies Jaccard in the combo-hash
    space shared with the DuckDB oracle (see
    :func:`_combo_shingle_docs`); ``'text'`` re-derives and intersects
    the shingle STRINGS — the exact string-set Jaccard, which can
    differ from the oracle's hash-space answer on (rare) collisions.
    Callers running several miners pass the persisted shingle relation
    via ``_hsd`` (they own its lifecycle) so the corpus is shingled
    exactly once.
    """
    caches: list[DataFrame] = []
    if verify_on == "text":
        sh = cache_intermediate(_shingle_docs(docs, text_col, id_col))
        caches.append(sh)
    if _hsd is None:
        hsd = cache_intermediate(_combo_shingle_docs(docs, text_col, id_col))
        caches.append(hsd)
    else:
        hsd = _hsd
    p = F.col("sz") - F.floor(F.lit(threshold) * F.col("sz")) + 1
    prefix = hsd.select(
        "doc_id",
        "sz",
        F.explode(F.slice(F.array_sort("hs"), F.lit(1), p)).alias("hsh"),
    )
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "hsh")
        .where(
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.lit(threshold) * F.col("b.sz") <= F.col("a.sz"))
            & (F.lit(threshold) * F.col("a.sz") <= F.col("b.sz"))
        )
        .select(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .distinct()
    )
    if verify_on == "text":
        out = _pair_jaccard(cand, sh).where(F.col("jaccard") >= threshold)
    else:
        out = _pair_jaccard_hashed(cand, hsd).where(F.col("jaccard") >= threshold)
    return materialize_release(out, *caches)


def jaccard_pairs_sql(
    threshold: float = 0.8, text_expr: str = "text", where_sql: str = "TRUE"
) -> str:
    """Oracle twin of :func:`jaccard_pairs` — same combo-hash space,
    but as a plain (unfiltered) inverted-index join: the oracle states
    WHAT the answer is; the Spark side adds the prefix/length pruning
    that computes the same answer at scale. ``where_sql`` restricts the
    document population (mirrors filtering ``docs`` before mining)."""
    hs = combo_shingle_hashes_sql(text_expr)
    return f"""
    WITH sh AS (
        SELECT doc_id, {hs} AS hs FROM documents WHERE {where_sql}
    ), shn AS (
        SELECT doc_id, hs FROM sh WHERE len(hs) > 0
    ), post AS (
        SELECT doc_id, unnest(hs) AS h FROM shn
    ), cand AS (
        SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
        FROM post a JOIN post b ON a.h = b.h AND a.doc_id < b.doc_id
    )
    SELECT doc1, doc2,
           round(len(list_intersect(x.hs, y.hs))::DOUBLE /
                 (len(x.hs) + len(y.hs) - len(list_intersect(x.hs, y.hs))), 6)
               AS jaccard
    FROM cand JOIN shn x ON cand.doc1 = x.doc_id
              JOIN shn y ON cand.doc2 = y.doc_id
    WHERE round(len(list_intersect(x.hs, y.hs))::DOUBLE /
                (len(x.hs) + len(y.hs) - len(list_intersect(x.hs, y.hs))), 6)
          >= {threshold}
    """


def _containment_candidates(
    hsd: DataFrame,
    threshold: float,
    max_shingle_df: int | None,
    outer_ids: DataFrame | None,
) -> DataFrame:
    """Raw ``(inner_doc, outer_doc)`` candidate stream (pre-distinct,
    self-pairs included) for :func:`containment_pairs` — separated so
    the candidate-cardinality bound the ``max_shingle_df`` ceiling
    buys is directly testable (the hot-shingle pytest counts these
    rows with and without the ceiling). ``outer_ids`` (a 1-column
    ``doc_id`` relation) restricts which docs are indexable as
    outers — ids, not a predicate, because the shingle relation only
    carries (doc_id, sz, hs): a predicate over caller columns must be
    evaluated against the DOCS relation (review r15 pass 2 — a
    materialized/table-checkpointed hsd has no lineage for Spark's
    missing-reference resolution to recover the source column)."""
    p = F.col("sz") - F.floor(F.lit(threshold) * F.col("sz")) + 1
    outer_hsd = (
        hsd.join(outer_ids, "doc_id", "left_semi")
        if outer_ids is not None
        else hsd
    )
    posts = outer_hsd.select(
        F.col("doc_id").alias("outer_doc"), F.explode("hs").alias("hsh")
    )
    if max_shingle_df is None:
        inner = hsd.select(
            F.col("doc_id").alias("inner_doc"),
            F.explode(F.slice(F.array_sort("hs"), F.lit(1), p)).alias("hsh"),
        )
        return inner.join(posts, "hsh")
    if max_shingle_df < 1:
        raise ValueError(f"max_shingle_df must be >= 1, got {max_shingle_df}")
    # The FREQUENT-hash set (df > ceiling over the OUTER index): one
    # map-side-combinable count over the postings explode, filtered to
    # <= total_postings/ceiling rows — SMALL, so every join against it
    # below is broadcast-sized (AQE picks it; never forced). A draft
    # that joined the FULL per-hash df relation onto the exploded
    # corpus for strict rarest-first ordering paid a corpus-wide
    # shuffle for tie-break precision the bound does not need: ANY
    # p-subset is a valid prefix, so ordering by (is-frequent, value)
    # keeps the exact same guarantee — every chosen non-frequent hash
    # has df <= ceiling — at one big shuffle less (q33 warm 5.5 -> ~3 s
    # at sf0.1 when this join went broadcast).
    freq_hashes = (
        posts.groupBy("hsh")
        .agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") > max_shingle_df)
        .select("hsh", F.lit(1).alias("_f"))
    )
    # Rare-first prefix: frequent hashes sort LAST (ties by value), so
    # a doc's prefix is all-rare whenever it has >= p rare hashes. The
    # window partitions on doc_id — per-partition rows = shingle
    # count, bounded by document length, skew-free at any corpus size.
    expl = (
        hsd.select(
            F.col("doc_id").alias("inner_doc"),
            "sz",
            F.explode("hs").alias("hsh"),
        )
        .join(freq_hashes, "hsh", "left")
        .withColumn("_f", F.coalesce("_f", F.lit(0)))
    )
    w = Window.partitionBy("inner_doc").orderBy("_f", "hsh")
    pref = expl.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") <= p
    )
    # Capped index: anti-join away the (few) frequent hashes.
    posts_capped = posts.join(freq_hashes, "hsh", "left_anti")
    rare_cand = (
        pref.where(F.col("_f") == 0)
        .select("inner_doc", "hsh")
        .join(posts_capped, "hsh")
    )
    # Scoped fallback: frequent hashes that SURVIVED into a prefix
    # (docs with < p rare hashes). Usually empty; when not, the
    # full postings are consulted only for exactly these hashes.
    freq_pref = pref.where(F.col("_f") == 1)
    posts_freq = posts.join(
        freq_pref.select("hsh").distinct(), "hsh", "left_semi"
    )
    fallback_cand = freq_pref.select("inner_doc", "hsh").join(posts_freq, "hsh")
    return rare_cand.select("inner_doc", "outer_doc").unionByName(
        fallback_cand.select("inner_doc", "outer_doc")
    )


def containment_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: int | None = None,
    outer_pred: Column | None = None,
    _hsd: DataFrame | None = None,
) -> DataFrame:
    """ASYMMETRIC near-subset pairs: ordered ``(inner_doc, outer_doc,
    containment)`` with ``containment = |S(inner) ∩ S(outer)| /
    |S(inner)| >= threshold`` — the quote/subset detector symmetric
    Jaccard deliberately misses (a short doc copied verbatim inside a
    long one has J ≈ |A|/|B| ≈ 0, containment = 1; Lee et al. 2022's
    substring-dedup motivation at shingle granularity). Same combo
    shingle-hash space as :func:`jaccard_pairs`, so the DuckDB twin
    (:func:`containment_pairs_sql`) is bit-identical.

    Scale shape: the PREFIX filter applies to the inner side
    (containment >= t needs a collision inside SOME ``sz -
    floor(t*sz) + 1``-subset of the inner doc's hashes — at most
    ``sz - ceil(t*sz)`` of them can miss the outer set, so ANY
    subset of that size contains a shared hash; the PPJoin argument,
    which holds for an arbitrary consistent choice of subset, not
    just the value-sorted one). The OUTER side has no length filter
    (that asymmetry is the operator), so an unbounded index would
    make one corpus-frequent shingle (boilerplate, license headers)
    quadratic in its document frequency. ``max_shingle_df`` bounds
    it EXACTLY, the rare-first discipline :func:`edit_distance_join`
    pioneered here:

    - each inner doc's prefix prefers RARE hashes (df <= ceiling over
      the outer index) — frequent hashes sort last, ties by value — a
      valid prefix choice per the argument above, and every chosen
      rare hash's collision count is bounded by the ceiling;
    - the postings index drops hashes with df > ``max_shingle_df``,
      so every index key's collision count is bounded;
    - prefix hashes that are THEMSELVES frequent (a doc with fewer
      than ``p`` rare hashes — almost-all-boilerplate) fall back to
      a scoped index built only over those surviving frequent
      hashes: exact always, bounded whenever coverage holds, and
      the fallback's cost is confined to the pathological docs.

    Every true pair is still found: a qualifying pair shares a hash
    with the inner's prefix, and that hash is fully indexed either
    in the capped postings (df <= ceiling) or the fallback postings
    (df > ceiling but present in some prefix). ``outer_pred``
    pre-restricts the outer population (per-source / per-shard — the
    other documented 100 TB mitigation) and changes semantics by
    design: only pairs whose OUTER doc satisfies it are returned.
    Callers running several miners pass the persisted shingle
    relation via ``_hsd`` (they own its lifecycle)."""
    owns = _hsd is None
    hsd = (
        cache_intermediate(_combo_shingle_docs(docs, text_col, id_col))
        if owns
        else _hsd
    )
    # evaluate outer_pred against DOCS (where the caller's columns
    # live) and carry only the surviving ids into the index — the
    # shingle relation may be materialized (table mode / shared _hsd)
    # with no lineage back to the caller's schema
    outer_ids = (
        docs.where(outer_pred).select(F.col(id_col).alias("doc_id"))
        if outer_pred is not None
        else None
    )
    cand = (
        _containment_candidates(hsd, threshold, max_shingle_df, outer_ids)
        .where(F.col("inner_doc") != F.col("outer_doc"))
        .select("inner_doc", "outer_doc")
        .distinct()
    )
    x = hsd.select(
        F.col("doc_id").alias("inner_doc"),
        F.col("sz").alias("isz"),
        F.col("hs").alias("ih"),
    )
    y = hsd.select(
        F.col("doc_id").alias("outer_doc"), F.col("hs").alias("oh")
    )
    out = (
        cand.join(x, "inner_doc")
        .join(y, "outer_doc")
        .select(
            "inner_doc",
            "outer_doc",
            F.round(
                F.size(F.array_intersect("ih", "oh")).cast("double")
                / F.col("isz"),
                6,
            ).alias("containment"),
        )
        .where(F.col("containment") >= threshold)
    )
    return materialize_release(out, *([hsd] if owns else []))


def containment_pairs_sql(
    threshold: float = 0.8,
    text_expr: str = "text",
    where_sql: str = "TRUE",
    outer_where_sql: str = "TRUE",
) -> str:
    """Oracle twin of :func:`containment_pairs` — the same unfiltered
    inverted-index join as :func:`jaccard_pairs_sql`, ordered pairs,
    containment score. ``max_shingle_df`` needs no twin knob: the
    capped miner is EXACT (same output), which is precisely what
    pairing it against this uncapped oracle proves.
    ``outer_where_sql`` mirrors ``outer_pred`` (restricts which docs
    may appear as ``outer_doc``)."""
    hs = combo_shingle_hashes_sql(text_expr)
    return f"""
    WITH sh AS (
        SELECT doc_id, {hs} AS hs,
               ({outer_where_sql}) AS is_outer
        FROM documents WHERE {where_sql}
    ), shn AS (
        SELECT doc_id, hs, is_outer FROM sh WHERE len(hs) > 0
    ), post AS (
        SELECT doc_id, unnest(hs) AS h FROM shn WHERE is_outer
    ), ipost AS (
        SELECT doc_id, unnest(hs) AS h FROM shn
    ), cand AS (
        SELECT DISTINCT a.doc_id AS inner_doc, b.doc_id AS outer_doc
        FROM ipost a JOIN post b ON a.h = b.h AND a.doc_id <> b.doc_id
    )
    SELECT inner_doc, outer_doc,
           round(len(list_intersect(x.hs, y.hs))::DOUBLE / len(x.hs), 6)
               AS containment
    FROM cand JOIN shn x ON cand.inner_doc = x.doc_id
              JOIN shn y ON cand.outer_doc = y.doc_id
    WHERE round(len(list_intersect(x.hs, y.hs))::DOUBLE / len(x.hs), 6)
          >= {threshold}
    """


# --------------------------------------------------------------- MinHash/LSH
def _perm(a: int, b: int):
    """One universal-hash permutation as a 1-arg HOF lambda (PySpark
    counts lambda parameters — default-arg capture would change arity)."""
    return lambda h: (F.lit(a) * h + F.lit(b)) % MERSENNE_31


def minhash_signature_cols(hs_col: Column) -> list[Column]:
    """The K per-permutation min-hash values over a hashed-shingle array."""
    return [
        F.array_min(F.transform(hs_col, _perm(a, b))).alias(f"mh{i}")
        for i, (a, b) in enumerate(MINHASH_COEFFS)
    ]


def minhash_bands(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    _hsd: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, band_id, band_key): the LSH bucket relation.

    Pure stateless Column expressions end-to-end (tokenize → combo
    hashes → K permutation minima → band keys → posexplode), so the
    SAME code runs over a batch corpus or a Structured Streaming
    micro-batch — which is what makes the stream-static incremental
    dedup gate possible (stream side computes its bands per batch,
    joins the precomputed corpus bands; see
    tests/test_streaming.py::test_streaming_dedup_gate_stream_static).
    Callers sharing the hashed-shingle relation pass it via ``_hsd``.
    """
    hsd = _combo_shingle_docs(docs, text_col, id_col) if _hsd is None else _hsd
    sigs = hsd.select("doc_id", *minhash_signature_cols(F.col("hs")))
    band_keys = [
        F.concat_ws(
            "-",
            *[
                F.col(f"mh{b * MINHASH_ROWS + r}").cast("string")
                for r in range(MINHASH_ROWS)
            ],
        ).alias(f"band{b}")
        for b in range(MINHASH_BANDS)
    ]
    return sigs.select("doc_id", *band_keys).select(
        "doc_id",
        F.posexplode(
            F.array(*[F.col(f"band{b}") for b in range(MINHASH_BANDS)])
        ).alias("band_id", "band_key"),
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    _hsd: DataFrame | None = None,
) -> DataFrame:
    """MinHash+LSH candidates (band-bucket join) verified with exact
    Jaccard over the combo-hash shingle sets. The 100 TB dedup path:
    never enumerates non-colliding pairs.

    One persist of (doc_id, sz, hs) feeds both the K=16 signature
    expressions (the barrier stops project-collapsing from re-inlining
    the hashing into each one) and the verify join — and it is the
    same relation :func:`jaccard_pairs` and :func:`simhash_pairs`
    build, so callers running several miners pass it via ``_hsd`` (they
    own its lifecycle) and the corpus is shingled exactly once."""
    owns = _hsd is None
    hsd = cache_intermediate(_combo_shingle_docs(docs, text_col, id_col)) if owns else _hsd
    bands = minhash_bands(docs, text_col, id_col, _hsd=hsd)
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band_id", "band_key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .distinct()
    )
    out = _pair_jaccard_hashed(cand, hsd).where(F.col("jaccard") >= threshold)
    return materialize_release(out, *([hsd] if owns else []))


def minhash_dedup_sql(threshold: float = 0.8, text_expr: str = "text") -> str:
    hs = combo_shingle_hashes_sql(text_expr)
    sig_exprs = ", ".join(
        f"list_min(list_transform(hs, x -> ({a}*x + {b}) % {MERSENNE_31})) AS mh{i}"
        for i, (a, b) in enumerate(MINHASH_COEFFS)
    )
    band_exprs = ", ".join(
        "concat_ws('-', "
        + ", ".join(
            f"CAST(mh{b * MINHASH_ROWS + r} AS VARCHAR)" for r in range(MINHASH_ROWS)
        )
        + f") AS band{b}"
        for b in range(MINHASH_BANDS)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, band{b} AS band_key FROM bandkeys"
        for b in range(MINHASH_BANDS)
    )
    return f"""
    WITH sh AS (
        SELECT doc_id, {hs} AS hs FROM documents
    ), shn AS (
        SELECT doc_id, hs FROM sh WHERE len(hs) > 0
    ), sigs AS (
        SELECT doc_id, {sig_exprs} FROM shn
    ), bandkeys AS (
        SELECT doc_id, {band_exprs} FROM sigs
    ), bands AS (
        {band_rows}
    ), cand AS (
        SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
        FROM bands a JOIN bands b
          ON a.band_id = b.band_id AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
    )
    SELECT doc1, doc2,
           round(len(list_intersect(x.hs, y.hs))::DOUBLE /
                 (len(x.hs) + len(y.hs) - len(list_intersect(x.hs, y.hs))), 6)
               AS jaccard
    FROM cand JOIN shn x ON cand.doc1 = x.doc_id
              JOIN shn y ON cand.doc2 = y.doc_id
    WHERE round(len(list_intersect(x.hs, y.hs))::DOUBLE /
                (len(x.hs) + len(y.hs) - len(list_intersect(x.hs, y.hs))), 6)
          >= {threshold}
    """


# ------------------------------------------------------------------ SimHash
def simhash_col(hs_col: Column) -> Column:
    """32-bit SimHash of a hashed-shingle array (raw 60-bit hashes; bits
    0..31 used). Majority vote per bit, ties → 0."""
    def bit_set(j: int):
        return lambda h: F.shiftright(h, j) % 2 == 1

    n = F.size(hs_col)
    terms: list[Column] = []
    for j in range(SIMHASH_BITS):
        cnt = F.size(F.filter(hs_col, bit_set(j)))
        terms.append(F.when(cnt * 2 > n, F.lit(1 << j)).otherwise(F.lit(0)))
    return functools.reduce(_op.add, terms).cast("long")


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    _hsd: DataFrame | None = None,
) -> DataFrame:
    """SimHash near-dup pairs via pigeonhole band join.

    hamming ≤ 3 over 32 bits ⇒ at least one of the 4 bytes is identical,
    so joining on any-equal-byte finds EVERY qualifying pair (no recall
    loss), while comparing only candidate buckets — the scale path.

    Signatures are computed over the shared combo shingle-hash space
    (:func:`_combo_shingle_docs` — one md5 per token, Horner-composed),
    the SAME relation the Jaccard and MinHash miners index: a caller
    running several miners passes the persisted relation via ``_hsd``
    and the corpus is shingled exactly once (see q34). Combo hashes are
    mod 2^31−1, so bit 31 is constant-0 — harmless: a never-differing
    bit can't break the pigeonhole argument. When ``_hsd`` is supplied
    the CALLER owns its lifecycle; otherwise it is built and released
    here.
    """
    owns = _hsd is None
    d = cache_intermediate(_combo_shingle_docs(docs, text_col, id_col)) if owns else _hsd
    sh = d.select("doc_id", simhash_col(F.col("hs")).alias("simhash"))
    bands = sh.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    (F.shiftright(F.col("simhash"), SIMHASH_BAND_BITS * b) % 256).alias(f"x{b}")
                    for b in range(SIMHASH_N_BANDS)
                ]
            )
        ).alias("band_id", "band_val"),
    )
    out = (
        bands.alias("a")
        .join(bands.alias("b"), ["band_id", "band_val"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc1"),
            F.col("b.doc_id").alias("doc2"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return materialize_release(out, *([d] if owns else []))


def simhash_sql(max_hamming: int = 3, text_expr: str = "text") -> str:
    """Oracle twin of :func:`simhash_pairs` over the combo hash space
    (same constants as ``combo_shingle_hashes_sql``)."""
    bit_terms = " + ".join(
        f"(CASE WHEN 2 * len(list_filter(hs, h -> (h >> {j}) & 1 = 1)) > len(hs) "
        f"THEN {1 << j} ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    return f"""
    WITH sh AS (
        SELECT doc_id, {combo_shingle_hashes_sql(text_expr)} AS hs
        FROM documents
    ), shn AS (SELECT doc_id, hs FROM sh WHERE len(hs) > 0
    ), sims AS (
        SELECT doc_id, CAST({bit_terms} AS BIGINT) AS simhash FROM shn
    )
    SELECT a.doc_id AS doc1, b.doc_id AS doc2,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM sims a JOIN sims b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


# ------------------------------------------------------ connected components
def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 25,
    algorithm: str = "propagation",
) -> DataFrame:
    """Connected components of an undirected pair graph → ``(node,
    label)`` where ``label`` is the component's minimum node id.

    Two selectable distributed algorithms (VERDICT r10 #3):

    - ``"propagation"`` (default): iterative min-label propagation —
      each round a node takes the min of its own label and its
      neighbors' labels; stop when no label changes. Rounds = graph
      DIAMETER; per round one equi-join + one min-agg (two shuffles on
      the node key). The right default for near-dup graphs, whose
      clusters are shallow (a dup of a dup of a dup is rare — q59
      converges in ~4 rounds).
    - ``"two-phase"``: alternating large-star/small-star (Kiveris,
      Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected Components
      in MapReduce and Beyond", SoCC 2014) — O(log n) rounds on ANY
      graph shape, including the adversarial duplicate chain that
      degenerates propagation to O(n) rounds (a 1000-node chain
      converges in 11 alternating rounds; tests/test_dedup.py). Each
      round is two star operations: large-star hangs every
      larger-than-center neighbor off the neighborhood minimum,
      small-star re-hangs the smaller ones; the fixed point of both is
      a star forest whose centers are the component minima (Thm 1).
      Per round ~3 shuffles per star (groupBy-min, join, distinct) —
      more per round than propagation, exponentially fewer rounds.

    - ``"auto"``: propagation under a small round budget
      (``min(max_iters, 8)`` — generous for the shallow clusters dedup
      graphs actually have), falling back to two-phase on exhaustion
      instead of raising — callers shouldn't have to know their graph's
      diameter (VERDICT r11 #5). The fallback restarts from the edges
      (the spent propagation rounds are discarded — bounded at 8 cheap
      rounds, vs an unbounded diameter if propagation kept going).

    NULL endpoints are dropped on BOTH paths (a NULL node id is
    meaningless): an edge with one NULL endpoint contributes only its
    non-NULL node (as a singleton unless other edges connect it), and
    the two algorithms return identical labelings on such inputs.

    Both use eager mode-switchable checkpoints to truncate the growing
    lineage (round N must not replay rounds 1..N-1 — the classic
    iterative-Spark trap) and release round N-1's blocks as soon as
    round N exists. Driver holds only convergence counters, never the
    graph. Raises after ``max_iters`` non-converged rounds rather than
    returning silently-partial labels; ``connected_components.
    last_rounds`` / ``.last_algorithm`` record the converged round
    count and which algorithm produced the labels, for tests/ops.
    """
    if algorithm == "two-phase":
        out = _connected_components_two_phase(edges, src, dst, max_iters)
        connected_components.last_algorithm = "two-phase"
        return out
    if algorithm == "auto":
        labels = _connected_components_propagation(
            edges, src, dst, min(max_iters, _AUTO_PROPAGATION_BUDGET)
        )
        if labels is not None:
            connected_components.last_algorithm = "propagation"
            return labels
        out = _connected_components_two_phase(edges, src, dst, max_iters)
        connected_components.last_algorithm = "two-phase"
        return out
    if algorithm != "propagation":
        raise ValueError(
            f"algorithm {algorithm!r} not in "
            "('propagation', 'two-phase', 'auto')"
        )
    labels = _connected_components_propagation(edges, src, dst, max_iters)
    if labels is None:
        raise ValueError(
            f"connected_components('propagation') did not converge in "
            f"{max_iters} rounds — the graph's diameter exceeds the "
            f"budget; use algorithm='two-phase' (O(log n) rounds) or "
            f"'auto' (propagation with a two-phase fallback)"
        )
    connected_components.last_algorithm = "propagation"
    return labels


# auto mode's propagation round budget before falling back to
# two-phase: dedup graphs converge in ~4 rounds (q59), so 8 spends at
# most ~2× the typical work before conceding the graph is deep
_AUTO_PROPAGATION_BUDGET = 8


def _connected_components_propagation(
    edges: DataFrame, src: str, dst: str, max_iters: int
) -> DataFrame | None:
    """Min-label propagation loop with TWO-HOP shortcutting (pointer
    doubling, optimization r19); returns the converged labels, or
    ``None`` after ``max_iters`` non-converged rounds (all cached state
    released either way — the caller decides whether exhaustion raises
    or falls back).

    From round 3 on, a node takes the min over (a) its own label,
    (b) its neighbors' labels, and (c) its LABEL'S label — one extra
    equi-join against the previous round's already-checkpointed
    relation. The shortcut makes label reach double per round, so
    rounds — and with them the per-round checkpoint + convergence-count
    barrier jobs, the dominant cost of iterative CC at scale — go from
    diameter to ~log₂(diameter) on deep graphs. Rounds 1–2 stay plain
    ON PURPOSE: the jump can shorten nothing before reach 2, and real
    dedup graphs are that shallow (q59's planted pairs converge in 2
    rounds at every SF — measured r19; an unconditional jump added a
    per-round join for zero round savings there). Final labels are
    IDENTICAL either way: labels only ever decrease, every label is a
    component member's id (both hop forms preserve this), and a round
    with zero changes still implies label(x) ≤ min over neighbors,
    which forces the all-equal-per-component fixed point — the same
    argument as plain propagation (planted-graph parity pinned in
    tests/test_llm_ops.py)."""
    sym = edges.select(
        F.col(src).cast("long").alias("node"), F.col(dst).cast("long").alias("nbr")
    ).union(
        edges.select(F.col(dst).cast("long").alias("node"), F.col(src).cast("long").alias("nbr"))
    ).where(F.col("node").isNotNull())  # NULL endpoints dropped (contract)
    sym = cache_intermediate(sym.repartition("node"))
    labels = checkpoint_result(
        sym.select("node").distinct().withColumn("label", F.col("node"))
    )
    converged = False
    for rounds in range(1, max_iters + 1):
        nbr_labels = labels.select(
            F.col("node").alias("nbr"), F.col("label").alias("nbr_label")
        )
        if rounds >= 3:
            # two-hop term: label(label(x)) off the CHECKPOINTED
            # previous round (joining the checkpoint twice is cheap; a
            # self-join on this round's aggregate would compute the
            # aggregate twice). label(y) ≤ y always, so the jump keeps
            # labels monotone; the left join's coalesce covers nothing
            # in practice (every label IS a node with a label row) but
            # keeps the row count pinned.
            self_term = (
                labels.alias("a")
                .join(
                    labels.select(
                        F.col("node").alias("_jn"),
                        F.col("label").alias("_jl"),
                    ),
                    F.col("a.label") == F.col("_jn"),
                    "left",
                )
                .select(
                    F.col("a.node").alias("node"),
                    F.coalesce(F.col("_jl"), F.col("a.label")).alias(
                        "label"
                    ),
                )
            )
        else:
            self_term = labels
        proposed = (
            sym.join(nbr_labels, "nbr")
            .select("node", F.col("nbr_label").alias("label"))
            .union(self_term)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        proposed = checkpoint_result(proposed)
        changed = (
            proposed.alias("new")
            .join(labels.alias("old"), "node")
            .where(F.col("new.label") != F.col("old.label"))
            .count()
        )
        # round N-1's checkpoint blocks are dead once `changed` is
        # computed — drop them now instead of waiting for GC, or a long
        # chain of rounds holds diameter× copies of the label relation.
        release_result(labels)
        labels = proposed
        if changed == 0:
            converged = True
            break
    release_intermediate(sym)
    if not converged:
        release_result(labels)
        return None
    connected_components.last_rounds = rounds
    return labels


def _cc_canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    return (
        edges.select(
            F.greatest(
                F.col(src).cast("long"), F.col(dst).cast("long")
            ).alias("hi"),
            F.least(F.col(src).cast("long"), F.col(dst).cast("long")).alias(
                "lo"
            ),
        )
        .where(F.col("hi") != F.col("lo"))
        .distinct()
    )


def _cc_large_star(e: DataFrame) -> DataFrame:
    """(v, min(Γ⁺(u))) for every neighbor v > u — hangs each node's
    larger neighbors off its closed-neighborhood minimum. Output stays
    canonical (hi > lo) since m ≤ u < v."""
    adj = e.select(F.col("hi").alias("u"), F.col("lo").alias("v")).union(
        e.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    )
    mins = adj.groupBy("u").agg(
        F.least(F.min("v"), F.col("u")).alias("m")
    )
    return (
        adj.where(F.col("v") > F.col("u"))
        .join(mins, "u")
        .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
        .where(F.col("hi") != F.col("lo"))
        .distinct()
    )


def _cc_small_star(e: DataFrame) -> DataFrame:
    """Re-hang each node's SMALLER neighbors (plus itself) off their
    minimum. On canonical edges Γ⁻(hi) is exactly the lo side, so this
    is one groupBy-min + one join. Output canonical: v > m for kept
    neighbors, u > m always."""
    mins = e.groupBy("hi").agg(F.min("lo").alias("m"))
    rehung = (
        e.join(mins, "hi")
        .where(F.col("lo") != F.col("m"))
        .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
    )
    selfedge = mins.select(F.col("hi"), F.col("m").alias("lo"))
    return rehung.union(selfedge).distinct()


def _cc_same_edge_set(a: DataFrame, b: DataFrame) -> bool:
    """Set equality for two DISTINCT edge relations in ONE action: the
    symmetric difference has a witness row iff the sets differ, and
    limit(1) stops at the first witness. The earlier count-compare +
    one-way-except form was also deterministic but cost three jobs per
    call (~4 extra jobs per two-phase round on top of its checkpoints
    — VERDICT r11 #7). Still never a hashable signature: a hash
    collision could stop the loop early on UNEQUAL sets, silently
    mislabeling components."""
    return (
        a.exceptAll(b).union(b.exceptAll(a)).limit(1).count() == 0
    )


def _connected_components_two_phase(
    edges: DataFrame, src: str, dst: str, max_iters: int = 25
) -> DataFrame:
    """Alternating large-star/small-star; see
    :func:`connected_components`. Converged when BOTH operations are
    fixed points (Kiveris et al. Thm 1: that is exactly the star-forest
    condition), checked deterministically via set equality — never a
    hash signature that could collide into a false stop."""
    # node set captured ONCE up front (NULL endpoints dropped, matching
    # propagation's contract) and checkpointed: deriving it lazily after
    # convergence would re-execute the full upstream edges plan twice —
    # expensive when `edges` is a lazy pair-mining lineage (review r11
    # pass 2)
    nodes = checkpoint_result(
        edges.select(F.col(src).cast("long").alias("node"))
        .union(edges.select(F.col(dst).cast("long").alias("node")))
        .where(F.col("node").isNotNull())
        .distinct()
    )
    e = checkpoint_result(_cc_canonical_edges(edges, src, dst))
    converged = False
    for rounds in range(1, max_iters + 1):
        ls = checkpoint_result(_cc_large_star(e))
        ss = checkpoint_result(_cc_small_star(ls))
        done = _cc_same_edge_set(ls, e) and _cc_same_edge_set(ss, ls)
        release_result(e)
        release_result(ls)
        e = ss
        if done:
            converged = True
            break
    if not converged:
        release_result(e)
        release_result(nodes)
        raise ValueError(
            f"connected_components('two-phase') did not converge in "
            f"{max_iters} rounds — at O(log n) rounds this indicates a "
            f"pathological input; raise max_iters"
        )
    # star forest → labels: leaves point at their center, centers at
    # themselves (a center never appears on the hi side at fixed point).
    # Nodes whose only edges were SELF-LOOPS were erased by the
    # canonicalization filter (hi != lo) — re-attach them as their own
    # singleton components so both algorithms return the same node set
    # (propagation labels them; review r11).
    star = e.select(F.col("hi").alias("node"), F.col("lo").alias("label")).union(
        e.select(F.col("lo").alias("node"), F.col("lo").alias("label"))
    ).distinct()
    loners = nodes.join(star, "node", "left_anti").select(
        "node", F.col("node").alias("label")
    )
    labels = checkpoint_result(star.union(loners))
    release_result(e)
    release_result(nodes)
    connected_components.last_rounds = rounds
    return labels


def dedup_clusters(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
    score: Column | None = None,
    cc_algorithm: str = "auto",
) -> DataFrame:
    """Resolve near-dup PAIRS into CLUSTERS: every document tagged with
    its component id (min doc id of the cluster; singletons are their
    own component) and the cluster size. Downstream "keep one per
    cluster" is ``where(doc_id == component)`` — the canonical-survivor
    rule is deterministic and needs no extra pass.

    ``score``: optional quality expression over ``docs``' columns —
    when given, a ``survivor`` column names the doc each cluster should
    KEEP under quality-ranked selection (max score, ties → min id):
    real pipelines keep the best duplicate, not the lexicographically
    first. The rank window shares the cluster_size window's partition
    key, so it reuses the same exchange — one extra in-partition sort,
    no new shuffle.

    ``cc_algorithm`` defaults to ``"auto"`` (VERDICT r12 #2): shallow
    dedup graphs resolve in a few cheap propagation rounds, and a
    deep-diameter pair graph (an adversarial duplicate chain) silently
    falls back to the O(log n) two-phase algorithm instead of raising —
    pipeline callers shouldn't have to know their graph's diameter.
    Both algorithms produce identical labelings (parity-tested at three
    scales), so the switch is invisible in the output."""
    from pyspark.sql import Window

    comp = connected_components(
        pairs, src="doc1", dst="doc2", algorithm=cc_algorithm
    )
    score_cols = [] if score is None else [score.alias("_score")]
    out = (
        docs.select(F.col(id_col).cast("long").alias(id_col), *score_cols)
        .join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("label", F.col(id_col)).alias("component"),
            *(["_score"] if score is not None else []),
        )
        .withColumn(
            "cluster_size",
            F.count(F.lit(1)).over(Window.partitionBy("component")),
        )
    )
    if score is not None:
        w_best = Window.partitionBy("component").orderBy(
            F.desc("_score"), F.asc(id_col)
        )
        out = out.withColumn("survivor", F.first(id_col).over(w_best)).drop(
            "_score"
        )
    # comp is checkpointed (CC must truncate lineage) — materialize the
    # tagged output now so comp's blocks can be dropped deterministically;
    # the caller owns exactly one handle, freed with release_result().
    out = checkpoint_result(out)
    release_result(comp)
    return out


def dedup_clusters_sql(
    threshold: float = 0.8, text_expr: str = "text", where_sql: str = "TRUE",
    score_sql: str | None = None,
) -> str:
    """Oracle twin of :func:`dedup_clusters` over Jaccard pairs: the
    transitive closure as a recursive CTE (fine at oracle scale; the
    Spark side is the distributed formulation). ``score_sql`` mirrors
    the ``score`` parameter: adds the quality-ranked ``survivor``
    column (max score, ties → min id) via a first_value window."""
    jp = jaccard_pairs_sql(
        threshold=threshold, text_expr=text_expr, where_sql=where_sql
    )
    survivor = (
        ""
        if score_sql is None
        else f""",
           first_value(d.doc_id) OVER (
               PARTITION BY coalesce(c.component, d.doc_id)
               ORDER BY {score_sql} DESC, d.doc_id ASC) AS survivor"""
    )
    return f"""
    WITH RECURSIVE
    jp AS ({jp}),
    edges AS (
        SELECT doc1 AS a, doc2 AS b FROM jp
        UNION
        SELECT doc2 AS a, doc1 AS b FROM jp
    ),
    reach(src, dst) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    ),
    comp AS (
        SELECT src AS doc_id, least(src, min(dst)) AS component
        FROM reach GROUP BY src
    )
    SELECT d.doc_id,
           coalesce(c.component, d.doc_id) AS component,
           count(*) OVER (
               PARTITION BY coalesce(c.component, d.doc_id)) AS cluster_size{survivor}
    FROM (SELECT * FROM documents WHERE {where_sql}) d
    LEFT JOIN comp c ON d.doc_id = c.doc_id
    """


def incremental_dedup_pairs(
    docs: DataFrame,
    is_new: Column,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    materialize: bool = True,
    _hsd: DataFrame | None = None,
) -> DataFrame:
    """Incremental ingestion dedup: which NEW documents near-duplicate
    the EXISTING corpus? ``is_new`` is a boolean Column splitting the
    input. Mines the full pair graph with the prefix-filtered
    :func:`jaccard_pairs` machinery, then keeps only cross-set pairs,
    reported as ``(new_doc, corpus_doc, jaccard)``.

    Append-only pipelines run this per batch: the corpus side's shingle
    index is the reusable artifact (at scale, a persisted/bucketed
    table keyed on prefix hash). Composing the verified pair miner
    keeps one code path for both full and incremental dedup.

    Scale note: ``sides`` is O(corpus), so it must NEVER be broadcast —
    the pair relation is the small side here (post-threshold survivors).
    No hints: the equi-joins on doc1/doc2 shuffle-join by default, and
    AQE may demote them to a runtime broadcast of whichever side is
    actually small, which is never forced to be the corpus.

    ``materialize=False`` is the plan-inspection escape hatch: returns
    ``(lazy_result, pairs_cache)`` where ``lazy_result`` is the
    un-checkpointed join plan (so its executedPlan shows the real join
    strategy, not ``Scan ExistingRDD``) and ``pairs_cache`` is the
    checkpointed pair relation the plan reads — the caller must
    ``release_result(pairs_cache)`` when done. Production callers use
    the default, which returns one self-owned DataFrame.

    ``_hsd`` passes a caller-owned persisted shingle relation through
    to :func:`jaccard_pairs` (the q61 host shares one tokenize across
    its pairs and bloom legs).
    """
    sides = docs.select(F.col(id_col), is_new.alias("is_new"))
    pairs = jaccard_pairs(
        docs, threshold=threshold, text_col=text_col, id_col=id_col,
        _hsd=_hsd,
    )
    a = sides.withColumnRenamed(id_col, "doc1").withColumnRenamed("is_new", "new1")
    b = sides.withColumnRenamed(id_col, "doc2").withColumnRenamed("is_new", "new2")
    out = (
        pairs.join(a, "doc1")
        .join(b, "doc2")
        .where(F.col("new1") != F.col("new2"))
        .select(
            F.when(F.col("new1"), F.col("doc1")).otherwise(F.col("doc2")).alias("new_doc"),
            F.when(F.col("new1"), F.col("doc2")).otherwise(F.col("doc1")).alias("corpus_doc"),
            "jaccard",
        )
    )
    if not materialize:
        return out, pairs
    # pairs is checkpointed (jaccard_pairs materializes it) — fold it
    # into the (smaller) cross-set survivor set and drop its blocks.
    out = materialize_release(out)
    release_result(pairs)
    return out


def incremental_dedup_sql(threshold: float = 0.8, new_pred_sql: str = "doc_id % 5 = 0") -> str:
    """Oracle twin of :func:`incremental_dedup_pairs` with ``is_new``
    given as a SQL predicate over ``documents``."""
    jp = jaccard_pairs_sql(threshold=threshold)
    return f"""
    WITH jp AS ({jp}),
    sides AS (SELECT doc_id, ({new_pred_sql}) AS is_new FROM documents)
    SELECT CASE WHEN a.is_new THEN jp.doc1 ELSE jp.doc2 END AS new_doc,
           CASE WHEN a.is_new THEN jp.doc2 ELSE jp.doc1 END AS corpus_doc,
           jp.jaccard
    FROM jp JOIN sides a ON jp.doc1 = a.doc_id
            JOIN sides b ON jp.doc2 = b.doc_id
    WHERE a.is_new <> b.is_new
    """


# --------------------------------------------------------- decontamination
DECON_NGRAM = 4  # measured: 3-grams flag ~94% of this small-vocab corpus
                 # (spurious), 5+-grams find ~0 hits at sf0.01; 4-grams
                 # flag 8/8/727 docs at sf0.001/0.01/0.1 — non-trivial at
                 # every scale while still meaning real phrase overlap.


def decon_shingles(
    docs: DataFrame,
    is_benchmark: Column,
    n: int = DECON_NGRAM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The (doc_id, is_bench, sg) shingle relation every
    decontamination-family ranker indexes — built once and passed via
    the ``_sg`` parameter when several legs share it (q34's ``_hsd``
    recipe; the caller owns the cache).

    Short docs emit ``sg = []`` instead of being filtered (optimization
    r19): the old pre-shuffle ``where(size(tokens(..)) >= n)`` guard
    was a FULL map-side tokenize of every row — one serial task on a
    single-split corpus, and a second whole-corpus tokenize pass at any
    scale (the pushed-down filter can't share the post-exchange
    projection's work across the shuffle boundary). Every consumer
    reaches this relation through an ``explode(sg)``
    (:func:`~unimib_simpss_spark.operators.retrieval.gram_collisions`),
    where an empty array emits nothing — identical collision rows,
    identical ranker outputs (``shingles_from_tokens`` already
    short-circuits sub-``n`` docs to ``[]``). The sub-``n`` rows ride
    the exchange as dead weight, but they are by definition the
    corpus's smallest rows (the dup_gram_relations trade, applied
    here)."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(text_col).alias("_text"),
            is_benchmark.alias("is_bench"),
        )
        .repartition("doc_id")
        .select("doc_id", "is_bench", tokens("_text").alias("tk"))
        .select(
            "doc_id", "is_bench", shingles_from_tokens(F.col("tk"), n).alias("sg")
        )
    )


def decontaminate(
    docs: DataFrame,
    is_benchmark: Column,
    n: int = DECON_NGRAM,
    min_shared: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    _sg: DataFrame | None = None,
    _collisions: DataFrame | None = None,
) -> DataFrame:
    """Benchmark decontamination by n-gram collision: flag every
    TRAINING document sharing ≥ ``min_shared`` distinct word ``n``-grams
    with any BENCHMARK document (``is_benchmark`` boolean Column splits
    the input) — the standard eval-leakage gate of an LLM data pipeline
    (GPT-3 App. C / PaLM-style n-gram overlap).

    Plan: one shingle pass (repartitioned by id so per-row shingling
    parallelizes off single-split files), exploded into an inverted
    index; candidates come from an equi-join on the gram — never an
    all-pairs product. The benchmark side is tiny by construction, so
    AQE broadcasts it; output is one groupBy on the training doc id.
    Returns ``(doc_id, n_shared_ngrams, n_bench_docs)``.

    Scale note: grams join as strings here for bit-exact oracle parity;
    at 100 TB swap the join key to a 64-bit gram hash (same shape,
    ~10× narrower shuffle rows).
    """
    from unimib_simpss_spark.operators.retrieval import gram_collisions

    own_sg = _sg is None and _collisions is None
    if _collisions is None:
        sg = (
            cache_intermediate(
                decon_shingles(docs, is_benchmark, n, text_col, id_col)
            )
            if own_sg
            else _sg
        )
        _collisions = gram_collisions(sg)
    out = (
        _collisions.groupBy("doc_id")
        .agg(
            F.count_distinct("g").alias("n_shared_ngrams"),
            F.count_distinct("bench_id").alias("n_bench_docs"),
        )
        .where(F.col("n_shared_ngrams") >= min_shared)
    )
    return materialize_release(out, *([sg] if own_sg else []))


def decontaminate_sql(
    bench_pred_sql: str = "doc_id % 97 = 0",
    n: int = DECON_NGRAM,
    min_shared: int = 1,
) -> str:
    """Oracle twin of :func:`decontaminate` with ``is_benchmark`` given
    as a SQL predicate over ``documents``."""
    sg = shingles_sql("text", n)
    return f"""
    WITH t AS (
        SELECT doc_id, ({bench_pred_sql}) AS is_bench, {sg} AS sg
        FROM documents
    ), tn AS (SELECT doc_id, is_bench, sg FROM t WHERE len(sg) > 0),
    bench AS (
        SELECT unnest(sg) AS g, doc_id AS bench_id FROM tn WHERE is_bench
    ), train AS (
        SELECT doc_id, unnest(sg) AS g FROM tn WHERE NOT is_bench
    )
    SELECT train.doc_id,
           count(DISTINCT train.g)  AS n_shared_ngrams,
           count(DISTINCT bench_id) AS n_bench_docs
    FROM train JOIN bench ON train.g = bench.g
    GROUP BY train.doc_id
    HAVING count(DISTINCT train.g) >= {min_shared}
    """


# ------------------------------------------------- edit-distance pairs
def edit_distance_pairs(
    df: DataFrame,
    str_col: str,
    id_col: str = "doc_id",
    max_dist: int = 2,
    q: int = 3,
) -> DataFrame:
    """Approximate-string-similarity self-join (entity resolution /
    fuzzy key matching): all pairs with ``levenshtein ≤ max_dist``,
    EXACTLY, without the naive |n|² comparison.

    The scalable shape is candidate generation + verification, same as
    the Jaccard/MinHash miners but with the edit-distance filter
    stack (Gravano et al. 2001 q-grams; Chaudhuri et al. 2006 prefix
    filtering):

    - **length band**: ``| |a|-|b| | ≤ d`` — an edit changes length by
      at most 1.
    - **q-gram prefix filter**: ``d`` edits destroy at most ``d·q`` of
      a string's ``|s|-q+1`` positional q-grams, so two strings within
      distance ``d`` must share a gram among their ``d·q+1`` GLOBALLY
      RAREST grams (rarest-first ordering makes the index buckets as
      small as possible — frequency ranking is one combinable gram
      count, the classic prefix-filtering trick). Candidates =
      equi-join on those prefix grams: cost tracks bucket sizes, never
      |n|².
    - **verification**: exact ``levenshtein`` (JVM built-in) on the
      candidates; output is exact, the filters only prune.

    Strings shorter than ``q·(d+1)`` can lose every gram to ``d``
    edits, so the gram filter is not exact for them — they route
    through a SHORT-STRING leg joined all-pairs within the (tiny,
    length-banded) short subset instead. The split keeps the operator
    exact at every length.

    Output: (``doc1``, ``doc2``, ``dist``) with doc1 < doc2, both
    directions deduplicated. Oracle twin: :func:`edit_distance_sql`
    (naive n² verify — fine at oracle scale).

    The gram relation feeds three consumers (frequency count, prefix
    ranking, probe side), so it is cached via ``cache_intermediate``
    and the result returned EAGER through ``materialize_release`` —
    without the cache, Catalyst plans three independent scan+posexplode
    subtrees (the module's standard shared-relation pattern; see
    ``_combo_shingle_docs``). Free the result with ``release_result``.
    """
    from pyspark.sql import Window

    d = max_dist
    min_len = q * (d + 1)
    s = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(str_col).alias("s"),
    ).where(F.col("s").isNotNull())
    s_long = s.where(F.length("s") >= min_len)
    s_short = s.where(F.length("s") < min_len)

    # POSITIONAL grams: a gram untouched by a ≤d-edit script maps to an
    # identical substring whose position shifts by at most d (one shift
    # per indel). Joining on (gram, position-bucket) instead of the bare
    # gram keeps the index buckets small even when the alphabet is tiny
    # and every string shares its common grams — the degeneration that
    # makes a bare-gram index collapse toward all-pairs on low-entropy
    # corpora (measured 3.8M candidates → ~10k on the synthetic docs).
    grams = cache_intermediate(
        s_long.select(
            "id",
            "s",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.length("s") - q + 1),
                    lambda i: F.col("s").substr(i, F.lit(q)),
                )
            ).alias("pos", "g"),
        )
    )
    freq = grams.groupBy("g").agg(F.count(F.lit(1)).alias("gf"))
    pi = d * q + 1
    bw = d + 1  # bucket width; probe side explodes the ≤3 buckets
    # covering [pos-d, pos+d], index side emits exactly one
    w = Window.partitionBy("id").orderBy(F.asc("gf"), F.asc("g"), F.asc("pos"))
    # prefix = the pi globally-rarest gram OCCURRENCES of each string:
    # ≤ d·q of a string's gram occurrences can be destroyed, so at least
    # one prefix occurrence of doc1 survives (position-shifted ≤ d) in
    # doc2's full gram list — prefix side joins the ALL-grams side.
    prefix = (
        grams.join(freq, "g")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= pi)
        .select("id", "s", "g", "pos")
    )
    a = prefix.select(
        F.col("id").alias("doc1"),
        F.col("s").alias("s1"),
        "g",
        F.col("pos").alias("p1"),
        F.explode(
            F.sequence(
                F.floor((F.col("pos") - d) / bw), F.floor((F.col("pos") + d) / bw)
            )
        ).alias("bkt"),
    )
    b = grams.select(
        F.col("id").alias("doc2"),
        F.col("s").alias("s2"),
        "g",
        F.col("pos").alias("p2"),
        F.floor(F.col("pos") / bw).alias("bkt"),
    )
    cand = (
        a.join(b, ["g", "bkt"])
        .where(
            (F.col("doc1") < F.col("doc2"))
            & (F.abs(F.col("p1") - F.col("p2")) <= d)
            & (F.abs(F.length("s1") - F.length("s2")) <= d)
        )
        .select("doc1", "doc2", "s1", "s2")
        .distinct()
    )
    # banded verify: the threshold form of levenshtein computes only the
    # 2d+1 diagonal band (O(d·L) per pair, not O(L²)) and returns -1
    # past the threshold — the right verifier when d << L.
    lev = F.levenshtein("s1", "s2", d)
    long_pairs = (
        cand.select("doc1", "doc2", lev.cast("long").alias("dist"))
        .where(F.col("dist") >= 0)
    )

    # short strings: all-pairs within the short subset only (bounded by
    # the short-string count, which a length histogram should keep tiny)
    sa = s_short.select(F.col("id").alias("doc1"), F.col("s").alias("s1"))
    sb = s_short.select(F.col("id").alias("doc2"), F.col("s").alias("s2"))
    short_pairs = (
        sa.join(sb, F.col("doc1") < F.col("doc2"))
        .where(F.abs(F.length("s1") - F.length("s2")) <= d)
        .select(
            "doc1",
            "doc2",
            F.levenshtein("s1", "s2", d).cast("long").alias("dist"),
        )
        .where(F.col("dist") >= 0)
    )
    # cross-length-class pairs: a short string within d of a long one
    # requires len ≥ min_len - d — join the short side against the
    # shortest long strings only (length band applies)
    xa = s_short.select(F.col("id").alias("doc1"), F.col("s").alias("s1"))
    xb = s_long.where(F.length("s") < min_len + d).select(
        F.col("id").alias("doc2"), F.col("s").alias("s2")
    )
    cross_pairs = (
        xa.join(xb, F.col("doc1") != F.col("doc2"))
        .where(F.abs(F.length("s1") - F.length("s2")) <= d)
        .select(
            F.least("doc1", "doc2").alias("doc1"),
            F.greatest("doc1", "doc2").alias("doc2"),
            F.levenshtein("s1", "s2", d).cast("long").alias("dist"),
        )
        .where(F.col("dist") >= 0)
    )
    return materialize_release(
        long_pairs.unionAll(short_pairs).unionAll(cross_pairs), grams
    )


def edit_distance_sql(
    str_expr: str, max_dist: int = 2, table: str = "documents",
    id_expr: str = "doc_id",
) -> str:
    """Oracle twin of :func:`edit_distance_pairs`: naive all-pairs
    levenshtein (quadratic — fine at oracle scale; the Spark side is
    the filtered formulation)."""
    return f"""
    WITH s AS (SELECT {id_expr} AS id, {str_expr} AS s FROM {table}
               WHERE {str_expr} IS NOT NULL)
    SELECT a.id AS doc1, b.id AS doc2,
           CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
    FROM s a JOIN s b ON a.id < b.id
    WHERE abs(length(a.s) - length(b.s)) <= {max_dist}
      AND levenshtein(a.s, b.s) <= {max_dist}
    """


def hamming_band_pairs(
    sigs: DataFrame,
    id_col: str,
    hash_col: str,
    max_hamming: int = 3,
    bits: int = 64,
    group_col: str | None = None,
) -> DataFrame:
    """Generic pigeonhole band join over ANY fixed-width hash column:
    all id pairs whose hashes differ in ≤ ``max_hamming`` bits —
    EXACTLY (no recall loss), without an all-pairs product.

    The pigeonhole argument (same as :func:`simhash_pairs`, generalized
    past its 32-bit text signature): split the ``bits``-bit hash into
    ``max_hamming + 1`` disjoint bands — at most ``max_hamming`` bands
    can contain a differing bit, so every qualifying pair agrees on at
    least one whole band and survives the (band_id, band_val) equi-join;
    the exact popcount filter then removes band-collision false
    positives. ``group_col`` (e.g. media kind) restricts pairs to equal
    group values by riding the same join key. Unsigned shifts
    throughout, so bit 63 being set cannot sign-smear band values.

    Output: ``(group_col?, id1, id2, hamming)`` with ``id1 < id2``,
    deduplicated. Input hashes must be 64-bit longs using the low
    ``bits`` bits.
    """
    if max_hamming < 0 or bits <= max_hamming:
        raise ValueError(f"need 0 <= max_hamming < bits, got {max_hamming}/{bits}")
    n_bands = max_hamming + 1
    w = bits // n_bands
    h = F.col(hash_col)
    band_vals = []
    for b in range(n_bands):
        lo = w * b
        width = (bits - lo) if b == n_bands - 1 else w
        v = F.shiftrightunsigned(h, lo)
        if width < 64:  # full-width band: mask would overflow a long
            v = v.bitwiseAND(F.lit((1 << width) - 1))
        band_vals.append(v)
    bands = sigs.select(
        *([group_col] if group_col else []),
        F.col(id_col).alias("_id"),
        h.alias("_h"),
        F.posexplode(F.array(*band_vals)).alias("band_id", "band_val"),
    )
    join_on = ["band_id", "band_val"] + ([group_col] if group_col else [])
    out = (
        bands.alias("a")
        .join(bands.alias("b"), join_on)
        .where(F.col("a._id") < F.col("b._id"))
        .select(
            *[F.col(f"a.{g}") for g in ([group_col] if group_col else [])],
            F.col("a._id").alias("id1"),
            F.col("b._id").alias("id2"),
            F.bit_count(F.col("a._h").bitwiseXOR(F.col("b._h")))
            .cast("long")
            .alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return out


def hamming_pairs_sql(
    hash_expr_sql: str,
    max_hamming: int = 3,
    table: str = "documents",
    id_expr: str = "doc_id",
) -> str:
    """Oracle twin of :func:`hamming_band_pairs`: brute-force all-pairs
    ``bit_count(xor())`` (quadratic — fine at oracle scale; the Spark
    side is the pigeonhole band join). ``hash_expr_sql`` must produce
    the same int64 the Spark side feeds the operator."""
    return f"""
    WITH h AS (
        SELECT {id_expr} AS id, {hash_expr_sql} AS hv FROM {table}
        WHERE {hash_expr_sql} IS NOT NULL
    )
    SELECT a.id AS doc1, b.id AS doc2,
           CAST(bit_count(xor(a.hv, b.hv)) AS BIGINT) AS hamming
    FROM h a JOIN h b ON a.id < b.id
    WHERE bit_count(xor(a.hv, b.hv)) <= {max_hamming}
    """


def edit_distance_join_sql(
    str_expr: str,
    left_pred_sql: str,
    right_pred_sql: str,
    max_dist: int = 2,
    table: str = "documents",
    id_expr: str = "doc_id",
) -> str:
    """Oracle twin of :func:`edit_distance_join`: naive cross-join
    levenshtein between the two predicate-defined sides (quadratic —
    fine at oracle scale; the Spark side is the prefix-filtered
    formulation). Mirrors :func:`edit_distance_sql` for the
    cross-relation form."""
    return f"""
    WITH l AS (SELECT {id_expr} AS left_id, {str_expr} AS s FROM {table}
               WHERE ({left_pred_sql}) AND {str_expr} IS NOT NULL),
         r AS (SELECT {id_expr} AS right_id, {str_expr} AS s FROM {table}
               WHERE ({right_pred_sql}) AND {str_expr} IS NOT NULL)
    SELECT l.left_id, r.right_id,
           CAST(levenshtein(l.s, r.s) AS BIGINT) AS dist
    FROM l JOIN r ON abs(length(l.s) - length(r.s)) <= {max_dist}
    WHERE levenshtein(l.s, r.s) <= {max_dist}
    """


def edit_distance_join(
    left: DataFrame,
    right: DataFrame,
    str_col: str,
    id_col: str = "doc_id",
    max_dist: int = 2,
    q: int = 3,
) -> DataFrame:
    """CROSS-relation approximate string join — the record-linkage form
    of :func:`edit_distance_pairs` (match table A's keys against table
    B's, e.g. vendor names vs master records): all (left, right) pairs
    with ``levenshtein ≤ max_dist``, exactly.

    Same filter stack, asymmetric roles: the LEFT side indexes only its
    ``d·q+1`` globally-rarest positional grams (frequencies counted
    over BOTH relations so 'rare' means rare in the join, not in one
    side); the RIGHT side probes with ALL its grams. ≤ d·q of the left
    string's gram occurrences can be destroyed by ``d`` edits, so every
    true pair survives the prefix join. Short strings (< ``q·(d+1)``)
    on either side route through banded small-side legs, keeping the
    join exact at every length.

    Output: (``left_id``, ``right_id``, ``dist``) — one row per
    matching pair (both ids always reported, no dedup across sides).
    """
    d = max_dist
    min_len = q * (d + 1)

    def prep(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            F.col(id_col).cast("long").alias(f"{tag}_id"),
            F.col(str_col).alias(f"{tag}_s"),
        ).where(F.col(f"{tag}_s").isNotNull())

    L, R = prep(left, "left"), prep(right, "right")
    L_long = L.where(F.length("left_s") >= min_len)
    R_long = R.where(F.length("right_s") >= min_len)

    def grams_of(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            f"{tag}_id",
            f"{tag}_s",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.length(f"{tag}_s") - q + 1),
                    lambda i: F.col(f"{tag}_s").substr(i, F.lit(q)),
                )
            ).alias("pos", "g"),
        )

    lg = cache_intermediate(grams_of(L_long, "left"))
    rg = cache_intermediate(grams_of(R_long, "right"))
    # rarity over BOTH relations: a gram common on one side but absent
    # on the other still makes a cheap bucket
    freq = (
        lg.select("g").unionAll(rg.select("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("gf"))
    )
    from pyspark.sql import Window

    pi = d * q + 1
    bw = d + 1
    w = Window.partitionBy("left_id").orderBy(
        F.asc("gf"), F.asc("g"), F.asc("pos")
    )
    prefix = (
        lg.join(freq, "g")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= pi)
    )
    a = prefix.select(
        "left_id",
        "left_s",
        "g",
        F.col("pos").alias("p1"),
        F.explode(
            F.sequence(
                F.floor((F.col("pos") - d) / bw), F.floor((F.col("pos") + d) / bw)
            )
        ).alias("bkt"),
    )
    b = rg.select(
        "right_id",
        "right_s",
        "g",
        F.col("pos").alias("p2"),
        F.floor(F.col("pos") / bw).alias("bkt"),
    )
    cand = (
        a.join(b, ["g", "bkt"])
        .where(
            (F.abs(F.col("p1") - F.col("p2")) <= d)
            & (F.abs(F.length("left_s") - F.length("right_s")) <= d)
        )
        .select("left_id", "right_id", "left_s", "right_s")
        .distinct()
    )
    lev = F.levenshtein("left_s", "right_s", d)
    long_pairs = (
        cand.select("left_id", "right_id", lev.cast("long").alias("dist"))
        .where(F.col("dist") >= 0)
    )
    # small-side legs: short-left × (short+boundary right) and
    # vice versa — each bounded by a short-string subset
    def banded(a_df, b_df):
        lv = F.levenshtein("left_s", "right_s", d)
        return (
            a_df.join(
                b_df,
                F.abs(F.length("left_s") - F.length("right_s")) <= d,
            )
            .select("left_id", "right_id", lv.cast("long").alias("dist"))
            .where(F.col("dist") >= 0)
        )

    L_short = L.where(F.length("left_s") < min_len)
    R_short = R.where(F.length("right_s") < min_len)
    R_boundary = R_long.where(F.length("right_s") < min_len + d)
    L_boundary = L_long.where(F.length("left_s") < min_len + d)
    out = (
        long_pairs
        .unionAll(banded(L_short, R_short))
        .unionAll(banded(L_short, R_boundary))
        .unionAll(banded(L_boundary, R_short))
    )
    return materialize_release(out, lg, rg)
