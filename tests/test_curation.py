"""Unit tests for the curation/privacy operators (PII scrub, bigram LM
scoring, per-source cap) beyond the oracle-parity gate: determinism,
idempotence, stability-under-append, and bound invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from unimib_simpss_spark.functions import privacy as P
from unimib_simpss_spark.operators import curation as C


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


# -------------------------------------------------------------- privacy


def test_pseudonym_stable_and_distinct(spark):
    df = spark.createDataFrame(
        [("Customer#000000001",), ("Customer#000000002",), ("Customer#000000001",)],
        ["name"],
    ).select(P.pseudonym("name").alias("p"))
    vals = [r.p for r in df.collect()]
    assert vals[0] == vals[2] != vals[1]
    assert all(len(v) == 16 for v in vals)


def test_redaction_removes_all_digits_and_is_idempotent(spark):
    df = spark.createDataFrame(
        [("Customer#000000042",), ("a1b22c333",), ("nodigits",), ("",)], ["name"]
    ).select(
        "name",
        P.redact_digits("name").alias("red"),
        P.digit_count("name").alias("nd"),
    )
    rows = df.select(
        "red", "nd", P.digit_count("red").alias("nd_after"),
        P.redact_digits("red").alias("red_twice"),
    ).collect()
    for r in rows:
        assert r.nd_after == 0  # no digit survives redaction
        assert r.red_twice == r.red  # idempotent
    assert rows[0].red == "Customer#[ID]"
    assert rows[1].red == "a[ID]b[ID]c[ID]" and rows[1].nd == 6


class TestStructuredPiiScrub:
    """The structured scrub family (VERDICT r16 #4): email / phone /
    IPv4 / IPv6 redaction with class tokens, hostile-input parity
    between the Spark Column chain and the DuckDB SQL twin (verbatim
    text, not just counts), plus the documented negative space —
    dates, ISBNs, card digit runs, times, MACs must survive."""

    CASES = [
        "Reach john.doe+x@sub.example.co.uk or mary%t@ex-a.io now",
        "user@192.168.1.1 logged in from 10.0.0.7",
        "call +39 02 1234 5678 or (02)12345678 or 555-123-4567",
        "dates 2023-08-16 and 16.08.2023 and ISBN 978-3-16-148410-0",
        "card 4111 1111 1111 1111 order 5551234567",
        "v10.1.2.3000 vs 1.2.3.4.5 vs 255.255.255.255",
        "2001:db8::1 and ::1 and fe80::1%eth0 and "
        "2001:0db8:85a3:0000:0000:8a2e:0370:7334",
        "time 12:30:45 mac 00:1a:2b:3c:4d:5e ratio 3:2",
        "std::vector and cafe::babe and a::b",
        "::ffff:192.168.1.1 mapped",
        "+1-800-555-0199 ext 77, (800) 555 0199, +12345678901",
        "no pii here at all, just text 42",
        "email@domain.museum trailing, x@y.io.",
        "3+4=7 and 1+1=2",
        "(2023) was a year 1234",
        "",
    ]

    def _spark_rows(self, spark):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.CASES)], "i int, t string"
        )
        cnts = P.pii_class_counts("t")
        return (
            df.select(
                "i",
                P.scrub_pii("t").alias("s"),
                *[v.alias(k) for k, v in cnts.items()],
            )
            .orderBy("i")
            .collect()
        )

    def test_verbatim_parity_with_duckdb_twin(self, spark):
        import duckdb

        con = duckdb.connect()
        con.execute("CREATE TABLE tt(i int, t varchar)")
        con.executemany(
            "INSERT INTO tt VALUES (?, ?)", list(enumerate(self.CASES))
        )
        csql = P.pii_class_counts_sql("t")
        sel = ", ".join(f"{v} AS {k}" for k, v in csql.items())
        duck = con.execute(
            f"SELECT i, {P.scrub_pii_sql('t')} AS s, {sel} "
            "FROM tt ORDER BY i"
        ).fetchall()
        got = [
            (r["i"], r["s"], r["emails"], r["phones"], r["ipv4"], r["ipv6"])
            for r in self._spark_rows(spark)
        ]
        assert got == [tuple(d) for d in duck]

    def test_scrubs_and_negative_space(self, spark):
        out = {r["i"]: r for r in self._spark_rows(spark)}
        s = {i: out[i]["s"] for i in out}
        # every class redacts to its own token
        assert s[0] == "Reach [EMAIL] or [EMAIL] now"
        assert s[2] == "call [PHONE] or [PHONE] or [PHONE]"
        assert s[6].count("[IP6]") == 4
        # numeric email host: email rule rejects, IPv4 rule owns it
        assert s[1] == "user@[IP4] logged in from [IP4]"
        # IPv4-mapped IPv6: the dotted-quad TAIL redacts first, then
        # the '::ffff' prefix — nothing leaks (review r17 pass 1: the
        # IPv6-first order scrubbed only '::ffff:192' and leaked the
        # other three octets)
        assert s[9] == "[IP6]:[IP4] mapped"
        # the documented negative space survives untouched
        for i in (3, 4, 7, 13, 14):  # dates/ISBN, cards, times/MAC, math
            assert s[i] == self.CASES[i], (i, s[i])
        # count profile matches the redactions
        assert (out[0]["emails"], out[2]["phones"]) == (2, 3)
        assert (out[1]["ipv4"], out[6]["ipv6"]) == (2, 4)

    def test_scrub_is_idempotent(self, spark):
        df = spark.createDataFrame(
            [(t,) for t in self.CASES], "t string"
        ).select(P.scrub_pii("t").alias("once"))
        rows = df.select(
            "once", P.scrub_pii("once").alias("twice")
        ).collect()
        assert all(r["once"] == r["twice"] for r in rows)


def test_kanon_flags_exactly_small_groups(spark):
    df = spark.createDataFrame(
        [("a", 1)] * 5 + [("b", 1)] * 4 + [("c", 2)] * 1, ["seg", "nat"]
    )
    out = {(r.seg, r.nat): (r.group_n, r.suppressed)
           for r in P.kanon_groups(df, ["seg", "nat"], k=5).collect()}
    assert out[("a", 1)] == (5, 0)
    assert out[("b", 1)] == (4, 1)
    assert out[("c", 2)] == (1, 1)


def test_ldiversity_homogeneous_group_suppressed(spark):
    """The homogeneity attack k-anonymity misses: a big group whose
    sensitive values are all identical has distinct_l=1, entropy=0 and
    must be flagged, however large it is."""
    df = spark.createDataFrame(
        [(1, "X")] * 50 + [(2, "X")] * 10 + [(2, "Y")] * 10 + [(2, "Z")] * 10,
        ["nat", "seg"],
    )
    out = {
        r.nat: r
        for r in P.ldiversity_groups(df, ["nat"], "seg", l_min=3).collect()
    }
    assert (out[1].group_n, out[1].distinct_l, out[1].entropy) == (50, 1, 0.0)
    assert out[1].suppressed == 1
    assert (out[2].group_n, out[2].distinct_l) == (30, 3)

    import math

    assert out[2].entropy == pytest.approx(math.log(3), abs=1e-6)


def test_ldiversity_tcloseness_flags_skewed_group(spark):
    """The skew attack: a group can be diverse (l >= l_min) yet sit far
    from the corpus prior — t-closeness catches it, and a group that
    mirrors the global mix reads tv_dist = 0."""
    # group 1 dominates the corpus with a uniform X/Y/Z mix (so the
    # global prior is ~uniform and group 1 sits near it); group 2 is
    # 90% X — diverse but skewed
    rows = (
        [(1, "X")] * 300 + [(1, "Y")] * 300 + [(1, "Z")] * 300
        + [(2, "X")] * 54 + [(2, "Y")] * 3 + [(2, "Z")] * 3
    )
    df = spark.createDataFrame(rows, ["nat", "seg"])
    out = {
        r.nat: r
        for r in P.ldiversity_groups(
            df, ["nat"], "seg", l_min=3, t_max=0.2
        ).collect()
    }
    assert out[2].distinct_l == 3  # diverse — l-diversity alone passes
    assert out[2].tv_dist > 0.2 and out[2].suppressed == 1
    assert out[1].tv_dist < 0.1 and out[1].suppressed == 0
    # hand value: group 2 p = (.9, .05, .05) vs the global mix
    g2 = [54 / 60, 3 / 60, 3 / 60]
    gl = [354 / 960, 303 / 960, 303 / 960]
    want = round(0.5 * sum(abs(a - b) for a, b in zip(g2, gl)), 6)
    assert out[2].tv_dist == pytest.approx(want, abs=2e-6)


def test_ldiversity_null_rows_excluded(spark):
    df = spark.createDataFrame(
        [(1, "X"), (1, "Y"), (1, None), (None, "X"), (2, "X")],
        "nat int, seg string",
    )
    out = {
        r.nat: r
        for r in P.ldiversity_groups(df, ["nat"], "seg", l_min=2).collect()
    }
    assert set(out) == {1, 2}  # NULL quasi key dropped
    assert out[1].group_n == 2  # NULL sensitive dropped
    with pytest.raises(ValueError, match="l_min"):
        P.ldiversity_groups(df, ["nat"], "seg", l_min=0)


# ------------------------------------------------------------ bigram LM


def test_doc_bigrams_counts_and_order(spark):
    df = spark.createDataFrame([(1, "a b c"), (2, "x"), (3, "p q")], ["doc_id", "text"])
    rows = sorted(
        (r.doc_id, r.w1, r.w2) for r in C.doc_bigrams(df).collect()
    )
    assert rows == [(1, "a", "b"), (1, "b", "c"), (3, "p", "q")]  # 1-token doc → none


def test_bigram_lm_rare_doc_scores_lower(spark):
    # 9 identical docs share one common bigram; the outlier's bigram is
    # globally unique, so its mean log-prob must be strictly lower.
    rows = [(i, "the cat") for i in range(9)] + [(99, "zyx qwv")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    scores = {r.doc_id: r.avg_logp for r in C.bigram_lm_scores(df).collect()}
    assert scores[99] < scores[0]
    assert len(scores) == 10


def test_bigram_lm_dsir_upweights_target_domain(spark):
    """DSIR importance weights must rank in-domain docs above
    out-of-domain docs: a doc made of the target's bigrams gets a
    positive weight, a doc of out-of-domain bigrams a negative one,
    and the 'lm' leg must match bigram_lm_scores on the same corpus."""
    rows = (
        [(i, "the cat sat", "tgt") for i in range(5)]
        + [(10 + i, "a dog ran", "other") for i in range(5)]
        + [(99, "the cat sat", "other")]  # in-domain text, other source
    )
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = C.bigram_lm_dsir(df, target_pred=F.col("source") == "tgt")
    dsir = {r.doc_id: r.score for r in out.where("section = 'dsir'").collect()}
    lm = {r.doc_id: r.score for r in out.where("section = 'lm'").collect()}
    assert len(dsir) == 11 and len(lm) == 11
    # target-looking docs (wherever they live) outrank out-of-domain docs
    assert dsir[0] > dsir[10]
    assert dsir[99] == dsir[0]  # weight depends on content, not membership
    # the lm leg is bigram_lm_scores' metric, verbatim
    ref = {r.doc_id: r.avg_logp for r in C.bigram_lm_scores(df).collect()}
    assert lm == ref


def test_doc_trigrams_counts_and_short_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "x"), (3, "p q"), (4, "r s t")],
        ["doc_id", "text"],
    )
    rows = sorted(
        (r.doc_id, r.w1, r.w2, r.w3) for r in C.doc_trigrams(df).collect()
    )
    # 1- and 2-token docs emit nothing (greatest(size-2, 0) guard)
    assert rows == [
        (1, "a", "b", "c"),
        (1, "b", "c", "d"),
        (4, "r", "s", "t"),
    ]


class TestTrigramLm:
    """The interpolated-trigram quality filter (VERDICT r16 #5): the
    fixture contract is SEPARATION — fluent documents (whose trigrams
    the corpus model has seen often) must score strictly above a
    shuffled-token document built from the same vocabulary (whose
    trigram and bigram contexts collapse to the unigram floor)."""

    FLUENT = "the quick brown fox jumps over the lazy dog"
    # same 9 tokens, fixed shuffled order — same unigram profile
    SHUFFLED = "dog the over fox quick lazy jumps brown the"

    def _corpus(self, spark):
        rows = [(i, self.FLUENT) for i in range(8)] + [(99, self.SHUFFLED)]
        return spark.createDataFrame(rows, ["doc_id", "text"])

    def test_fluent_separates_from_shuffled(self, spark):
        scores = {
            r.doc_id: (r.n_ngrams, r.score)
            for r in C.trigram_lm_scores(self._corpus(spark)).collect()
        }
        assert len(scores) == 9
        n, fluent = scores[0]
        n_s, shuf = scores[99]
        assert n == n_s == 7  # 9 tokens -> 7 trigrams
        # Separation with margin. NOTE the self-trained ceiling: a
        # novel trigram in a novel context scores c123/c12 = 1/1 on
        # the λ3 term (the corpus model has seen that context exactly
        # once — in this document), so the separation signal lives in
        # the λ2/λ1 context terms: fluent ≈ -0.152, shuffled ≈ -0.441
        # on this fixture (exact rational arithmetic, deterministic).
        # A reference-corpus-trained model would separate much harder;
        # scoring against the corpus's own counts is the documented
        # q64 regime.
        assert fluent > shuf + 0.25, (fluent, shuf)
        assert all(scores[i][1] == fluent for i in range(8))

    def test_lambdas_shift_mass_to_unigram_floor(self, spark):
        """With all weight on the unigram term the two docs tie (same
        token multiset); the default mixture separates them — the
        interpolation, not the tokens, carries the signal."""
        uni_only = {
            r.doc_id: r.score
            for r in C.trigram_lm_scores(
                self._corpus(spark), lambdas=(0.0, 0.0, 1.0)
            ).collect()
        }
        assert uni_only[0] == uni_only[99]

    def test_deterministic(self, spark):
        a = sorted(
            map(tuple, C.trigram_lm_scores(self._corpus(spark)).collect())
        )
        b = sorted(
            map(tuple, C.trigram_lm_scores(self._corpus(spark)).collect())
        )
        assert a == b

    def test_reference_trained_separates_domains(self, spark):
        """The pinned (reference-trained) mode — the CCNet regime: the
        model is the in-domain subset, everything scores under it. An
        in-domain doc rides high-probability model counts; a fully
        out-of-domain doc gets exactly the smoothed unigram floor on
        every trigram (hand-computable: p = λ1·(0+1)/(N+V))."""
        import math

        target = [(i, "the cat sat on the mat", "tgt") for i in range(5)]
        out = [(99, "zy qx wv uq tp", "other")]
        df = spark.createDataFrame(
            target + out, ["doc_id", "text", "source"]
        )
        # the model side never reads ids — an id-free reference corpus
        # must work (review r17 pass 3)
        ref = df.where(F.col("source") == "tgt").select("text")
        scores = {
            r.doc_id: r.score
            for r in C.trigram_lm_scores(df, ref=ref).collect()
        }
        assert len(scores) == 6
        # N = 30 target tokens, V = 5 distinct -> every unseen trigram
        # scores ln(0.1 * 1/35) exactly
        assert scores[99] == round(math.log(0.1 * (1.0 / 35.0)), 3)
        assert scores[0] > scores[99] + 4
        # self-trained mode on the same corpus would NOT separate this
        # hard (novel context => c123/c12 = 1/1 there)
        self_scores = {
            r.doc_id: r.score
            for r in C.trigram_lm_scores(df).collect()
        }
        assert self_scores[99] > scores[99] + 3

    def test_published_artifact_equals_ref_mode_and_is_scan_free(
        self, spark, tmp_path
    ):
        """publish_lm_counts → trigram_lm_scores(ref_counts=...) must
        equal the ref= mode row-for-row, and the scoring plan must
        never touch the reference corpus (the drift gates' pinned
        inputFiles contract)."""
        target = [(i, "the cat sat on the mat", "tgt") for i in range(5)]
        out = [(99, "zy qx wv uq tp", "other")]
        docs_path = f"{tmp_path}/docs.parquet"
        art_path = f"{tmp_path}/lm_artifact.parquet"
        ref_path = f"{tmp_path}/refcorpus.parquet"
        spark.createDataFrame(
            target + out, ["doc_id", "text", "source"]
        ).write.parquet(docs_path)
        docs = spark.read.parquet(docs_path)
        ref = docs.where(F.col("source") == "tgt").select("text")
        ref.write.parquet(ref_path)
        C.publish_lm_counts(spark.read.parquet(ref_path)).write.parquet(
            art_path
        )
        via_ref = sorted(
            map(tuple, C.trigram_lm_scores(docs, ref=ref).collect())
        )
        pinned = C.trigram_lm_scores(
            docs,
            ref_counts=spark.read.parquet(art_path),
            materialize=False,
        )
        assert sorted(map(tuple, pinned.collect())) == via_ref
        files = set(pinned.inputFiles())
        assert files and not any("refcorpus.parquet" in f for f in files), (
            files
        )
        # empty artifact (no unigram mass) rejected loudly
        with pytest.raises(ValueError, match="no unigram mass"):
            C.trigram_lm_scores(
                docs,
                ref_counts=spark.createDataFrame(
                    [], "slot int, key long, n_rows long"
                ),
            )
        # malformed artifact rejected by name
        with pytest.raises(ValueError, match="missing column"):
            C.trigram_lm_scores(
                docs,
                ref_counts=spark.createDataFrame(
                    [(0, 1)], "slot int, key long"
                ),
            )
        # exactly one reference form
        with pytest.raises(ValueError, match="exactly one reference"):
            C.trigram_lm_scores(
                docs, ref=ref, ref_counts=spark.read.parquet(art_path)
            )

    def test_invalid_artifact_leaks_nothing(self, spark, tmp_path):
        """An invalid ref_counts artifact must raise BEFORE anything
        is cached or materialized: in table-checkpoint mode the old
        order left an orphaned tokenize checkpoint behind the
        ValueError (review r17 pass 4, repro'd)."""
        from unimib_simpss_spark.operators.caching import (
            live_checkpoint_tables,
            persistent_rdd_ids,
            set_checkpoint_mode,
            set_checkpoint_table_dir,
        )

        docs = self._corpus(spark)
        bad = spark.createDataFrame([], "slot int, key long, n_rows long")
        before = persistent_rdd_ids(spark)
        with pytest.raises(ValueError, match="no unigram mass"):
            C.trigram_lm_scores(docs, ref_counts=bad)
        assert persistent_rdd_ids(spark) - before == set()
        set_checkpoint_table_dir(str(tmp_path / "ckpt_tables"))
        set_checkpoint_mode("table")
        try:
            with pytest.raises(ValueError, match="no unigram mass"):
                C.trigram_lm_scores(docs, ref_counts=bad)
            assert live_checkpoint_tables() == frozenset()
        finally:
            set_checkpoint_mode("local")
            set_checkpoint_table_dir(None)

    def test_materialize_false_corpus_built_leaks_nothing(
        self, spark, tmp_path
    ):
        """materialize=False must create NO internal caches (ADVICE
        r17): the corpus-built modes used to cache_intermediate their
        own toks/bic/unic and return early without releasing them —
        in table-checkpoint mode each call leaked never-deleted
        checkpoint-table directories. The lazy plan must also still
        score identically to the materialized one."""
        from unimib_simpss_spark.operators.caching import (
            live_checkpoint_tables,
            persistent_rdd_ids,
            set_checkpoint_mode,
            set_checkpoint_table_dir,
        )

        docs = self._corpus(spark)
        ref = docs.select("text")
        before = persistent_rdd_ids(spark)
        lazy_self = C.trigram_lm_scores(docs, materialize=False)
        lazy_ref = C.trigram_lm_scores(docs, ref=ref, materialize=False)
        got_self = sorted(map(tuple, lazy_self.collect()))
        got_ref = sorted(map(tuple, lazy_ref.collect()))
        assert persistent_rdd_ids(spark) - before == set()
        set_checkpoint_table_dir(str(tmp_path / "ckpt_tables_mf"))
        set_checkpoint_mode("table")
        try:
            C.trigram_lm_scores(docs, materialize=False).collect()
            C.trigram_lm_scores(docs, ref=ref, materialize=False).collect()
            assert live_checkpoint_tables() == frozenset()
        finally:
            set_checkpoint_mode("local")
            set_checkpoint_table_dir(None)
        eager_self = sorted(
            map(tuple, C.trigram_lm_scores(docs).collect())
        )
        eager_ref = sorted(
            map(tuple, C.trigram_lm_scores(docs, ref=ref).collect())
        )
        assert got_self == eager_self and got_ref == eager_ref

    def test_no_docs_no_toks_raises_descriptively(self, spark):
        """docs=None + toks=None is a descriptive ValueError, not an
        AttributeError out of _bound_tokens(None, ...) (ADVICE r17)."""
        with pytest.raises(ValueError, match="docs or a prebuilt toks"):
            C.doc_trigrams(None)
        with pytest.raises(ValueError, match="docs or a prebuilt toks"):
            C.trigram_lm_scores(None)

    def test_reference_trained_in_domain_close_to_self_trained(self, spark):
        """A doc made ONLY of model trigrams scores near the self-
        trained value — the pinned mode differs only by the smoothed
        unigram floor when everything is on-support."""
        target = [(i, "the cat sat on the mat", "tgt") for i in range(5)]
        df = spark.createDataFrame(target, ["doc_id", "text", "source"])
        pinned = {
            r.doc_id: r.score
            for r in C.trigram_lm_scores(df, ref=df.select("text")).collect()
        }
        self_t = {
            r.doc_id: r.score
            for r in C.trigram_lm_scores(df).collect()
        }
        assert abs(pinned[0] - self_t[0]) < 0.05


def test_source_cap_bounds_and_rank(docs):
    out = C.source_cap(docs, quota=7).cache()
    per = out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"), F.max("rk").alias("max_rk")
    )
    assert per.where((F.col("n") > 7) | (F.col("max_rk") > 7)).count() == 0
    # ranks within a source are dense 1..n
    dense = out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"), F.sum("rk").alias("s")
    )
    assert dense.where(F.col("s") != F.col("n") * (F.col("n") + 1) / 2).count() == 0
    out.unpersist()


def test_source_cap_stable_under_other_source_append(spark):
    base = spark.createDataFrame(
        [(i, "src_a") for i in range(20)], ["doc_id", "source"]
    )
    appended = base.unionAll(
        spark.createDataFrame([(100 + i, "src_b") for i in range(20)],
                              ["doc_id", "source"])
    )
    picks_before = {r.doc_id for r in
                    C.source_cap(base, quota=5).where("source = 'src_a'").collect()}
    picks_after = {r.doc_id for r in
                   C.source_cap(appended, quota=5).where("source = 'src_a'").collect()}
    assert picks_before == picks_after


def test_vocab_coverage_curve(spark):
    from unimib_simpss_spark.operators.curation import vocab_coverage

    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b d"), (3, "a")], ["doc_id", "text"]
    )
    rows = {r.token: r for r in vocab_coverage(docs, topk=3).collect()}
    # counts: a=5, b=3, c=1, d=1 → top3 = a, b, c (tie c<d)
    assert set(rows) == {"a", "b", "c"}
    assert rows["a"].rank == 1 and rows["a"].cnt == 5
    assert rows["b"].rank == 2 and rows["b"].cnt == 3
    assert rows["c"].rank == 3 and rows["c"].cnt == 1
    assert rows["a"].cum_share == 0.5          # 5/10
    assert rows["b"].cum_share == 0.8          # 8/10
    assert rows["c"].cum_share == 0.9          # 9/10 (d uncovered)


def test_vocab_coverage_monotone_on_corpus(spark, sf_dir):
    from unimib_simpss_spark.catalog import load_table
    from unimib_simpss_spark.operators.curation import vocab_coverage

    out = vocab_coverage(load_table(spark, sf_dir, "documents"), topk=20).collect()
    by_rank = sorted(out, key=lambda r: r.rank)
    cnts = [r.cnt for r in by_rank]
    assert cnts == sorted(cnts, reverse=True)
    shares = [r.cum_share for r in by_rank]
    assert shares == sorted(shares) and shares[-1] <= 1.0


def test_dup_spans_merges_contiguous_hits(spark):
    from unimib_simpss_spark.operators.curation import dup_spans

    para = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, f"{para} filler one two three four five six"),
            (2, f"unrelated lead in words here then {para}"),
            (3, "totally different text with no overlap at all whatsoever"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in dup_spans(docs, n=6).collect()}
    # the copied 8-token paragraph = three overlapping 6-grams per doc,
    # merged into ONE span of 8 tokens; doc 3 reports nothing
    assert set(rows) == {1, 2}
    for d in (1, 2):
        assert rows[d].n_dup_grams == 3
        assert rows[d].n_spans == 1
        assert rows[d].dup_tokens == 8


def test_dup_spans_separates_distant_hits(spark):
    from unimib_simpss_spark.operators.curation import dup_spans

    a = "one two three four five six"
    b = "seven eight nine ten eleven twelve"
    gap = " ".join(f"g{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, f"{a} {gap} {b}"), (2, f"{a} other words {b} trailing junk here")],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in dup_spans(docs, n=6).collect()}
    # each doc shares the two 6-token blocks, far enough apart in doc 1
    # to stay two spans of 6 tokens each
    assert rows[1].n_spans == 2 and rows[1].dup_tokens == 12


# ------------------------------------------------------------ unigram LM


def _ref_unigram_segmentations(word, vocab, max_len=8):
    """All segmentations of ``word`` into vocab pieces (enumeration —
    the independent reference for the lattice forward/backward)."""
    if not word:
        return [[]]
    out = []
    for j in range(1, min(len(word), max_len) + 1):
        if word[:j] in vocab:
            for rest in _ref_unigram_segmentations(word[j:], vocab, max_len):
                out.append([word[:j]] + rest)
    return out


def _ref_expected_counts(words, logp, max_len=8):
    """Brute-force E-step: per-piece expected counts over the full
    segmentation distribution, weighted by word counts."""
    import math

    expected = {p: 0.0 for p in logp}
    for w, c in words:
        segs = _ref_unigram_segmentations(w, set(logp), max_len)
        probs = [math.exp(sum(logp[p] for p in s)) for s in segs]
        z = sum(probs)
        if z <= 0:
            continue
        for s, pr in zip(segs, probs):
            for p in s:
                expected[p] += c * pr / z
    return expected


def test_unigram_forward_backward_matches_enumeration():
    import math

    from unimib_simpss_spark.operators.curation import (
        _unigram_forward_backward,
    )

    NEG = float("-inf")
    logp = {
        "a": math.log(0.3), "b": math.log(0.2), "ab": math.log(0.25),
        "ba": math.log(0.15), "aba": math.log(0.1),
    }
    words = [("abab", 3), ("aba", 2), ("bb", 1)]
    # Z parity: exp(lα[n]) equals the enumerated total probability
    for w, _ in words:
        segs = _ref_unigram_segmentations(w, set(logp))
        z_ref = sum(
            math.exp(sum(logp[p] for p in s)) for s in segs
        )
        _, _, lz = _unigram_forward_backward(w, logp, 8)
        assert abs(math.exp(lz) - z_ref) < 1e-12, w
    # expected-count parity: one E-step via lα/lβ equals the
    # brute-force enumeration
    expected = {p: 0.0 for p in logp}
    for w, c in words:
        la, lb, lz = _unigram_forward_backward(w, logp, 8)
        if lz == NEG:
            continue
        n = len(w)
        for i in range(n):
            for j in range(i + 1, min(n, i + 8) + 1):
                lp = logp.get(w[i:j])
                if lp is not None and la[i] != NEG and lb[j] != NEG:
                    expected[w[i:j]] += c * math.exp(
                        la[i] + lp + lb[j] - lz
                    )
    ref = _ref_expected_counts(words, logp)
    for p in logp:
        assert abs(expected[p] - ref[p]) < 1e-9, p


def test_unigram_lattice_survives_long_words():
    """The review-r18 underflow class: a whitespace-free word of
    hundreds of chars (URL, base64 blob, unsegmented CJK) underflowed
    the LINEAR lattice to Z = 0 exactly and silently dropped out of
    training; the log-domain lattice keeps it. 'ab'*200 at realistic
    piece probs is the reproduced case."""
    import math

    from unimib_simpss_spark.operators.curation import (
        _unigram_forward_backward,
    )

    logp = {
        "a": math.log(0.004), "b": math.log(0.004),
        "ab": math.log(0.002),
    }
    la, lb, lz = _unigram_forward_backward("ab" * 200, logp, 8)
    assert lz != float("-inf")
    # lnZ is at least the all-chars path and at most ln(1)
    assert 400 * math.log(0.004) <= lz < 0.0
    # forward and backward agree on the total mass
    assert abs(lz - lb[0]) < 1e-9


def test_unigram_trainer_long_word_corpus(spark):
    """End-to-end guard for the ZeroDivisionError half of the r18
    finding: a corpus whose every word is hundreds of chars (the
    all-long-words case that zeroed tot in em_block) must train, keep
    coverage, and encode."""
    from unimib_simpss_spark.operators.curation import (
        unigram_lm_vocab_driver,
        unigram_viterbi,
    )

    rows = [("ab" * 200,)] * 3 + [("cd" * 150,)] * 2
    docs = spark.createDataFrame(rows, ["text"])
    vocab = unigram_lm_vocab_driver(docs, vocab_size=6)
    table = {r["piece"]: r["logp"] for r in vocab.collect()}
    for ch in "abcd":
        assert ch in table, ch
    seg = unigram_viterbi("ab" * 200, table)
    assert "".join(seg) == "ab" * 200


def test_unigram_trainer_empty_corpus_returns_empty_vocab(spark):
    """An empty/whitespace-only corpus yields a 0-row vocab (the
    pre-r18 contract) — NOT the em_block zero-mass ValueError, whose
    diagnosis ('no word admits a segmentation') would be wrong when
    there are no words at all."""
    from unimib_simpss_spark.operators.curation import (
        unigram_lm_vocab_driver,
    )

    docs = spark.createDataFrame([("",), ("   ",)], ["text"])
    vocab = unigram_lm_vocab_driver(docs, vocab_size=4)
    assert vocab.count() == 0
    assert [f.name for f in vocab.schema.fields] == [
        "rank", "piece", "logp", "is_char",
    ]


def test_unigram_trainer_seed_candidate_gate(spark):
    import pytest

    from unimib_simpss_spark.operators.curation import (
        unigram_lm_vocab_driver,
    )

    docs = spark.createDataFrame([("hello there friends",)], ["text"])
    with pytest.raises(ValueError, match="max_seed_candidates"):
        unigram_lm_vocab_driver(docs, vocab_size=4, max_seed_candidates=10)


def test_doc_bigrams_none_raises_descriptive():
    import pytest

    from unimib_simpss_spark.operators.curation import doc_bigrams

    with pytest.raises(ValueError, match="pass docs or a prebuilt"):
        doc_bigrams(None)


def test_unigram_trainer_keeps_frequent_word_whole(spark):
    from unimib_simpss_spark.operators.curation import (
        unigram_lm_vocab_driver,
        unigram_viterbi,
    )

    rows = [("hello there",)] * 30 + [("xq zv",)] * 2
    docs = spark.createDataFrame(rows, ["text"])
    vocab = unigram_lm_vocab_driver(docs, vocab_size=12)
    table = {r["piece"]: r["logp"] for r in vocab.collect()}
    # every training character survives (coverage guarantee)
    for ch in set("hellotherexqzv"):
        assert ch in table, ch
    # the dominant words segment as single pieces under Viterbi
    assert unigram_viterbi("hello", table) == ["hello"]
    assert unigram_viterbi("there", table) == ["there"]
    # determinism: retraining yields the identical table
    again = {
        r["piece"]: r["logp"]
        for r in unigram_lm_vocab_driver(docs, vocab_size=12).collect()
    }
    assert again == table


def test_unigram_viterbi_matches_bruteforce_best(spark):
    import math

    from unimib_simpss_spark.operators.curation import (
        unigram_lm_vocab_driver,
        unigram_viterbi,
    )

    docs = spark.createDataFrame(
        [("abab aba bab",)] * 5 + [("ab ba b",)] * 3, ["text"]
    )
    table = {
        r["piece"]: r["logp"]
        for r in unigram_lm_vocab_driver(docs, vocab_size=8).collect()
    }
    for w in ("abab", "aba", "bab", "ab", "ba", "b", "abba"):
        got = unigram_viterbi(w, table)
        assert "".join(got) == w
        segs = _ref_unigram_segmentations(w, set(table))
        if segs:
            best_ref = max(
                sum(table[p] for p in s) for s in segs
            )
            assert abs(sum(table[p] for p in got) - best_ref) < 1e-12, w


def test_unigram_viterbi_unknown_char_fallback():
    import math

    from unimib_simpss_spark.operators.curation import unigram_viterbi

    table = {"a": math.log(0.6), "b": math.log(0.4)}
    out = unigram_viterbi("a!b", table)
    assert out == ["a", "!", "b"]


def test_unigram_encode_roundtrip(spark):
    from unimib_simpss_spark.operators.curation import (
        unigram_encode,
        unigram_lm_vocab_driver,
        unigram_viterbi,
    )

    docs = spark.createDataFrame(
        [(1, "hello there hello"), (2, "zvq"), (3, "")],
        ["doc_id", "text"],
    )
    vocab = unigram_lm_vocab_driver(docs, vocab_size=15)
    out = {r.doc_id: r for r in unigram_encode(docs, vocab).collect()}
    table = {r["piece"]: r["logp"] for r in vocab.collect()}
    # concatenating pieces reproduces each doc's non-space text, and
    # the distributed encode equals the driver Viterbi word-by-word
    for d, text in ((1, "hello there hello"), (2, "zvq"), (3, "")):
        want = []
        for w in text.split(" "):
            if w:
                want.extend(unigram_viterbi(w, table))
        assert list(out[d].pieces) == want, d
        assert out[d].n_pieces == len(want)
        assert "".join(out[d].pieces) == text.replace(" ", "")


def test_unigram_encode_keeps_input_id_type(spark):
    """The output schema derives the id field from the INPUT (the
    bpe_encode discipline) — a hardcoded `long` failed at the Arrow
    boundary for string ids (review r18 pass 5)."""
    from unimib_simpss_spark.operators.curation import (
        unigram_encode,
        unigram_lm_vocab_driver,
    )

    docs = spark.createDataFrame(
        [("d-1", "hello hello"), ("d-2", "there")], ["doc_id", "text"]
    )
    vocab = unigram_lm_vocab_driver(docs, vocab_size=12)
    out = unigram_encode(docs, vocab)
    assert out.schema["doc_id"].dataType.simpleString() == "string"
    got = {r.doc_id: "".join(r.pieces) for r in out.collect()}
    assert got == {"d-1": "hellohello", "d-2": "there"}


def test_remove_dup_spans_lowest_id_survives(spark):
    from unimib_simpss_spark.operators.curation import remove_dup_spans

    para = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, f"{para} filler one two three four five six"),
            (2, f"unrelated lead in words here then {para}"),
            (3, "totally different text with no overlap at all whatsoever"),
            (4, f"yet another copy here {para} and a tail"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in remove_dup_spans(docs, n=6).collect()}
    # every doc appears; doc 1 (lowest id) keeps the paragraph verbatim
    assert set(rows) == {1, 2, 3, 4}
    assert rows[1].removed_tokens == 0
    assert rows[1].text.startswith(para)
    # docs 2 and 4 lose exactly the 8-token paragraph, nothing else
    assert rows[2].removed_tokens == 8
    assert rows[2].text == "unrelated lead in words here then"
    assert rows[4].removed_tokens == 8
    assert rows[4].text == "yet another copy here and a tail"
    # untouched doc passes through as its normalized token stream
    assert rows[3].removed_tokens == 0
    assert rows[3].text.startswith("totally different")
    # the rewritten corpus has no shared 6-gram left across docs
    from unimib_simpss_spark.operators.curation import dup_spans

    rewritten = spark.createDataFrame(
        [(d, r.text) for d, r in rows.items()], ["doc_id", "text"]
    )
    assert dup_spans(rewritten, n=6).count() == 0


def test_remove_dup_spans_fully_duplicated_doc_empties(spark):
    from unimib_simpss_spark.operators.curation import remove_dup_spans

    para = "one two three four five six seven"
    docs = spark.createDataFrame(
        [(10, f"intro words {para} outro"), (20, para), (30, "tiny")],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in remove_dup_spans(docs, n=6).collect()}
    # doc 20 is nothing but the copied passage: it empties, stays a row
    assert rows[20].text == "" and rows[20].removed_tokens == 7
    assert rows[10].removed_tokens == 0
    # sub-n doc passes through
    assert rows[30].text == "tiny" and rows[30].removed_tokens == 0


def test_remove_dup_spans_union_of_overlapping_losses(spark):
    from unimib_simpss_spark.operators.curation import remove_dup_spans

    a = "a1 a2 a3 a4 a5 a6"  # owned by doc 1
    b = "b1 b2 b3 b4 b5 b6"  # owned by doc 2
    docs = spark.createDataFrame(
        [
            (1, f"{a} unique one filler"),
            (2, f"{b} other unique filler"),
            # doc 3 loses a to doc 1 AND b to doc 2, adjacent: both cut
            (3, f"keep this {a} {b} and this"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in remove_dup_spans(docs, n=6).collect()}
    assert rows[3].text == "keep this and this"
    assert rows[3].removed_tokens == 12
    assert rows[1].removed_tokens == 0 and rows[2].removed_tokens == 0


# ----------------------------------------------------------------- bm25


def test_bm25_rare_term_match_outranks_common_terms(spark):
    # bench doc 0 carries the rare term 'zebra'; only train doc 10 has
    # it, so doc 10 must outrank docs that share only ubiquitous terms.
    rows = [
        (0, "zebra data data"),
        (10, "zebra value"),
        (11, "data data data data"),
        (12, "data value row"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = C.bm25_decontam_topk(
        docs, is_benchmark=(F.col("doc_id") == 0), k=3
    ).collect()
    by_rank = {r.rank: r for r in out if r.bench_id == 0}
    assert by_rank[1].doc_id == 10
    assert all(r.score > 0 for r in out)


def test_bm25_rank_contract(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = C.bm25_decontam_topk(
        docs, is_benchmark=(F.col("doc_id") % 97 == 0), k=5
    )
    pdf = out.toPandas()
    assert (pdf["rank"].between(1, 5)).all()
    # no bench doc appears as a retrieved (train-side) document
    assert not (pdf["doc_id"] % 97 == 0).any()
    for _, g in pdf.groupby("bench_id"):
        g = g.sort_values("rank")
        # ranks are 1..n contiguous, scores non-increasing on the
        # rounded value (the ordering key)
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert (g["score"].diff().dropna() <= 1e-12).all()


# ------------------------------------------------------------------ bpe


def _ref_bpe(word_counts, n_merges, eow="</w>"):
    """Pure-Python reference BPE (Sennrich et al. 2016 learn_bpe):
    greedy left-to-right merge, overlapping pairs both counted, ties on
    count broken by lexicographically smallest (left, right)."""
    vocab = {}
    for w, c in word_counts.items():
        syms = tuple(list(w) + [eow])
        vocab[syms] = vocab.get(syms, 0) + c
    merges = []
    for step in range(1, n_merges + 1):
        stats = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                stats[p] = stats.get(p, 0) + c
        if not stats:
            break
        mx = max(stats.values())
        a, b = min(p for p, c in stats.items() if c == mx)
        merges.append((step, a, b, a + b, mx))
        new = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new[t] = new.get(t, 0) + c
        vocab = new
    return merges


def test_bpe_matches_reference_algorithm(spark, sf_dir):
    import duckdb

    wc = dict(
        duckdb.sql(
            f"""SELECT w, count(*) FROM (
                  SELECT unnest(string_split(text, ' ')) AS w
                  FROM read_parquet('{sf_dir}/documents.parquet'))
                WHERE w <> '' GROUP BY w"""
        ).fetchall()
    )
    expect = _ref_bpe(wc, n_merges=8)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = [
        (r.step, r.left, r.right, r.merged, r.pair_count)
        for r in C.bpe_merges(docs, n_merges=8).orderBy("step").collect()
    ]
    assert got == expect


def test_bpe_batched_matches_reference_algorithm(spark, sf_dir):
    """batch>1 must stay EXACTLY sequential-equivalent: the selected
    prefix is guarded by the created-pair count bound, so the merge
    table equals the pure-Python reference's on the real corpus."""
    import duckdb

    wc = dict(
        duckdb.sql(
            f"""SELECT w, count(*) FROM (
                  SELECT unnest(string_split(text, ' ')) AS w
                  FROM read_parquet('{sf_dir}/documents.parquet'))
                WHERE w <> '' GROUP BY w"""
        ).fetchall()
    )
    expect = _ref_bpe(wc, n_merges=10)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = [
        (r.step, r.left, r.right, r.merged, r.pair_count)
        for r in C.bpe_merges(docs, n_merges=10, batch=4).orderBy("step").collect()
    ]
    assert got == expect


def test_bpe_batched_stops_at_conflicts_and_ties(spark):
    """A corpus engineered so the top candidates share symbols and tie
    on counts: batching must emit exactly what sequential BPE emits
    (conflicting/tied pairs roll to later rounds, never get skipped)."""
    # 'ab' dominates; (b,c) conflicts with (a,b) via b; (c,d) ties with
    # created pairs — the guard must cut the batch, not reorder it.
    docs = spark.createDataFrame(
        [("abc abc abd cd cd cd",), ("abc abd ab cd",)], ["text"]
    )
    wc = {"abc": 3, "abd": 2, "ab": 1, "cd": 4}
    expect = _ref_bpe(wc, n_merges=6)
    got = [
        (r.step, r.left, r.right, r.merged, r.pair_count)
        for r in C.bpe_merges(docs, n_merges=6, batch=6).orderBy("step").collect()
    ]
    assert got == expect


def test_bpe_greedy_merge_and_tiebreak(spark):
    # 'aaa' under the (a,a) winner merges greedily left-to-right: one
    # merged pair plus a lone 'a', never an overlapping double-count on
    # the apply side.
    docs = spark.createDataFrame([("aaa aaa ab",)], ["text"])
    out = C.bpe_merges(docs, n_merges=2).orderBy("step").collect()
    # round 1: pairs (a,a)x2 per 'aaa' word => cnt 4; (a,</w>), (a,b)...
    assert (out[0].left, out[0].right, out[0].pair_count) == ("a", "a", 4)
    wc = {"aaa": 2, "ab": 1}
    assert [
        (r.step, r.left, r.right, r.merged, r.pair_count) for r in out
    ] == _ref_bpe(wc, n_merges=2)


def test_bpe_batched_survives_symbol_aliasing(spark):
    """Symbols are strings: over a binary alphabet, different merges
    birth IDENTICAL strings ('ab'+'a' and 'a'+'ba' both make 'aba') and
    merge concats collide with symbols older rounds already created —
    the aliasing that voids the created-pair bound. Batched selection
    must still equal the sequential reference exactly."""
    words = [
        "ab", "ba", "aba", "bab", "abab", "baba", "aabb", "bbaa",
        "abba", "baab", "aaab", "bbba", "abaa", "babb",
    ]
    text = " ".join(w for i, w in enumerate(words) for _ in range(17 - i))
    docs = spark.createDataFrame([(text,)], ["text"])
    wc = {w: 17 - i for i, w in enumerate(words)}
    for n in (6, 12):
        expect = _ref_bpe(wc, n_merges=n)
        for batch in (3, 5):
            got = [
                (r.step, r.left, r.right, r.merged, r.pair_count)
                for r in C.bpe_merges(docs, n_merges=n, batch=batch)
                .orderBy("step")
                .collect()
            ]
            assert got == expect, (n, batch)


def _ref_bpe_encode(text, table, eow="</w>"):
    """Pure-Python canonical BPE encode (Sennrich apply_bpe): per word,
    merge the lowest-rank pair present (greedy left-to-right within a
    pass) until none remains."""
    ranks = {(l, r): i for i, (l, r, *_) in enumerate(table)}
    merged = {(l, r): (m[0] if m else l + r) for l, r, *m in table}
    out = []
    for w in text.split(" "):
        if not w:
            continue
        syms = list(w) + [eow]
        while len(syms) > 1:
            cand = [
                (ranks[(syms[i], syms[i + 1])], (syms[i], syms[i + 1]))
                for i in range(len(syms) - 1)
                if (syms[i], syms[i + 1]) in ranks
            ]
            if not cand:
                break
            a, b = min(cand)[1]
            new, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    new.append(merged[(a, b)])
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            syms = new
        out.extend(syms)
    return out


def test_bpe_encode_canonical_matches_pure_python(spark, sf_dir):
    """VERDICT r8 #1: the Arrow-batched encoder applies a TRAINED merge
    table exactly like the canonical per-word min-rank algorithm, doc
    by doc across the real corpus."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges_df = C.bpe_merges(docs, n_merges=10)
    table = [
        (r.left, r.right, r.merged)
        for r in merges_df.orderBy("step").collect()
    ]
    got = {
        r.doc_id: list(r.bpe_tokens)
        for r in C.bpe_encode(docs, merges_df).select("doc_id", "bpe_tokens").collect()
    }
    for r in docs.select("doc_id", "text").collect():
        assert got[r.doc_id] == _ref_bpe_encode(r.text, table), r.doc_id


def test_bpe_encode_portable_equals_canonical(spark, sf_dir):
    """The Column-expression encode (merges in learned order, one
    greedy replace pass each) equals the canonical min-rank encode on
    an alias-free trained table — the equivalence the oracle surface
    (q27's bpe legs) rests on."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    table = [
        (r.left, r.right, r.merged)
        for r in C.bpe_merges(docs, n_merges=10).orderBy("step").collect()
    ]
    # alias-freedom: no merge's output equals another merge's operand
    # that could newly appear, and outputs are unique
    outs = [m for _, _, m in table]
    assert len(set(outs)) == len(outs)
    operands = {l for l, _, _ in table} | {r for _, r, _ in table}
    assert not (set(outs) & operands) or all(
        outs.index(m) < min(
            i for i, (l, r, _) in enumerate(table) if m in (l, r)
        )
        for m in (set(outs) & operands)
    )
    got = {
        r.doc_id: r.s
        for r in docs.select(
            "doc_id", C.bpe_encode_expr("text", table).alias("s")
        ).collect()
    }
    canon = {
        r.doc_id: " ".join(r.bpe_tokens)
        for r in C.bpe_encode(docs, table).select("doc_id", "bpe_tokens").collect()
    }
    assert got == canon
    cnt = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", C.bpe_token_count_expr("text", table).alias("n")
        ).collect()
    }
    for did, s in canon.items():
        assert cnt[did] == (len(s.split(" ")) if s else 0), did


def test_bpe_encode_edge_cases(spark):
    """Empty text, repeated spaces, sentinel-char injection, and the
    self-overlap pair (a,a) all encode identically across the Arrow
    encoder, the Column expression, and the pure-Python canon."""
    table = [("a", "a", "aa"), ("aa", "aa", "aaaa"), ("b", "</w>", "b</w>")]
    rows = [
        (1, "aaaa aaa b"),
        (2, ""),
        (3, "  a  "),
        (4, "ab\x01\x02ba"),
        (5, "aaaaa"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    arrow = {
        r.doc_id: list(r.bpe_tokens)
        for r in C.bpe_encode(df, table).collect()
    }
    col = {
        r.doc_id: (r.s.split(" ") if r.s else [])
        for r in df.select(
            "doc_id", C.bpe_encode_expr("text", table).alias("s")
        ).collect()
    }
    for did, txt in rows:
        # the Arrow encoder takes text verbatim (no sentinel machinery);
        # the Column form strips the two sentinel chars by contract
        assert arrow[did] == _ref_bpe_encode(txt, table), did
        clean = txt.replace("\x01", "").replace("\x02", "")
        expect = _ref_bpe_encode(clean, table)
        assert col[did] == expect, (did, col[did], expect)


def test_source_divergence_information_bounds(spark, sf_dir):
    """Entropy ≤ ln(n_types); KL ≥ 0 (Gibbs); 0 ≤ JS ≤ ln 2; and a
    single-source corpus has KL = JS = 0 exactly (p ≡ q)."""
    import math

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = C.source_divergence(docs).collect()
    assert rows
    for r in rows:
        assert r.entropy <= math.log(r.n_types) + 1e-9, r
        assert r.kl_corpus >= 0.0, r
        assert -1e-9 <= r.js_corpus <= math.log(2) + 1e-9, r
    one = C.source_divergence(docs.where(F.col("source") == rows[0].source))
    r1 = one.collect()[0]
    assert r1.kl_corpus == 0.0 and r1.js_corpus == 0.0


class TestChunking:
    """chunk_documents: overlap/stride semantics, the min-token tail
    rule, and value-level parity with the DuckDB twin through the same
    compare harness the driver uses."""

    def test_stride_overlap_and_tail_rule(self, spark):
        from unimib_simpss_spark.operators.curation import chunk_documents

        text = " ".join(f"w{i}" for i in range(100))  # 100 tokens
        docs = spark.createDataFrame(
            [(1, text), (2, "a b c")], "doc_id long, text string"
        )
        rows = {
            (r.doc_id, r.chunk_id): r
            for r in chunk_documents(
                docs, chunk_tokens=64, stride=48, min_tokens=8
            ).collect()
        }
        # doc 1: starts 0 and 48 (start 96 would add a 4-token stub < 8)
        d1 = [rows[(1, i)] for i in range(rows[(1, 0)].n_chunks)]
        assert [r.start_tok for r in d1] == [0, 48]
        assert [r.n_tok for r in d1] == [64, 52]
        # overlap: chunk 1 re-covers tokens 48..63
        assert d1[0].chunk_text.split()[48:] == d1[1].chunk_text.split()[:16]
        # short doc: exactly one whole-doc chunk
        d2 = rows[(2, 0)]
        assert d2.n_chunks == 1 and d2.n_tok == 3
        assert d2.chunk_text == "a b c"

    def test_validation(self, spark):
        import pytest as _pytest

        from unimib_simpss_spark.operators.curation import chunk_documents

        docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with _pytest.raises(ValueError, match="stride"):
            chunk_documents(docs, chunk_tokens=8, stride=0)
        with _pytest.raises(ValueError, match="stride"):
            chunk_documents(docs, chunk_tokens=8, stride=9)

    def test_oracle_parity_via_compare_harness(self, spark, sf_dir):
        from unimib_simpss_spark.operators.curation import (
            chunk_documents,
            chunk_documents_sql,
        )
        from unimib_simpss_spark.testing import (
            compare_query,
            duckdb_connection,
        )

        con = duckdb_connection(sf_dir)
        r = compare_query(
            spark,
            con,
            "chunking",
            lambda sp, sf: chunk_documents(
                sp.read.parquet(f"{sf}/documents.parquet"),
                chunk_tokens=64,
                stride=48,
                min_tokens=8,
            ),
            chunk_documents_sql(chunk_tokens=64, stride=48, min_tokens=8),
            sf_dir,
        )
        assert r.ok, r.mismatches[:3]
        assert r.spark_rows > 0


class TestCorpusDiff:
    def test_statuses_and_churn_only_output(self, spark):
        from unimib_simpss_spark.operators.curation import corpus_diff

        old = spark.createDataFrame(
            [(1, "alpha beta"), (2, "gamma delta"), (3, "epsilon")],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [(1, "alpha beta"), (2, "gamma CHANGED"), (4, "zeta")],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r for r in corpus_diff(old, new).collect()}
        assert set(rows) == {2, 3, 4}  # unchanged doc 1 excluded
        assert rows[2].status == "changed"
        assert rows[2].old_hash != rows[2].new_hash
        assert rows[3].status == "removed" and rows[3].new_hash is None
        assert rows[4].status == "added" and rows[4].old_hash is None

    def test_duckdb_value_parity(self, spark, sf_dir):
        """Old = full documents; new = drop every 7th, mutate every
        5th, append shifted copies — value parity via the driver's
        compare harness."""
        from pyspark.sql import functions as F

        from unimib_simpss_spark.operators.curation import (
            corpus_diff,
            corpus_diff_sql,
        )
        from unimib_simpss_spark.testing import (
            compare_query,
            duckdb_connection,
        )

        def new_snapshot_spark(docs):
            kept = docs.where("doc_id % 7 != 0").select(
                "doc_id",
                F.when(
                    F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" v2"))
                ).otherwise(F.col("text")).alias("text"),
            )
            appended = docs.select(
                (F.col("doc_id") + 100000).alias("doc_id"), "text"
            ).limit(10)
            return kept.unionAll(appended)

        new_sql = """
            SELECT doc_id,
                   CASE WHEN doc_id % 5 = 0 THEN text || ' v2'
                        ELSE text END AS text
            FROM documents WHERE doc_id % 7 != 0
            UNION ALL
            SELECT doc_id + 100000 AS doc_id, text
            FROM documents ORDER BY ALL LIMIT NULL
        """
        # NB: the appended leg must be DETERMINISTIC — use the 10
        # lowest ids on both sides instead of an arbitrary limit
        new_sql = """
            SELECT doc_id,
                   CASE WHEN doc_id % 5 = 0 THEN text || ' v2'
                        ELSE text END AS text
            FROM documents WHERE doc_id % 7 != 0
            UNION ALL
            SELECT doc_id + 100000 AS doc_id, text
            FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 10)
        """

        def spark_fn(sp, sf):
            docs = sp.read.parquet(f"{sf}/documents.parquet")
            appended = (
                docs.orderBy("doc_id").limit(10)
                .select((F.col("doc_id") + 100000).alias("doc_id"), "text")
            )
            kept = docs.where("doc_id % 7 != 0").select(
                "doc_id",
                F.when(
                    F.col("doc_id") % 5 == 0,
                    F.concat(F.col("text"), F.lit(" v2")),
                ).otherwise(F.col("text")).alias("text"),
            )
            return corpus_diff(docs, kept.unionAll(appended))

        r = compare_query(
            spark,
            duckdb_connection(sf_dir),
            "corpus_diff",
            spark_fn,
            corpus_diff_sql("SELECT * FROM documents", new_sql),
            sf_dir,
        )
        assert r.ok, r.mismatches[:3]
        assert r.spark_rows > 0


    def test_null_text_uses_presence_not_hash(self, spark):
        """CODE-REVIEW r10 — membership must come from presence flags:
        a NULL-text doc present in both snapshots diffs as changed (or
        not at all), never as 'added'; NULL-text docs can be removed."""
        from unimib_simpss_spark.operators.curation import corpus_diff

        old = spark.createDataFrame(
            [(1, None), (2, "x"), (3, None)], "doc_id long, text string"
        )
        new = spark.createDataFrame(
            [(1, "now real"), (2, None)], "doc_id long, text string"
        )
        rows = {r.doc_id: r for r in corpus_diff(old, new).collect()}
        assert rows[1].status == "changed"  # NULL -> text
        assert rows[2].status == "changed"  # text -> NULL
        assert rows[3].status == "removed"  # NULL-text doc dropped


def _enriched_corpus(spark, sf_dir):
    """documents.text ∪ customer names — x68's training corpus (the
    documents fixture alone has 31 word types and exhausts below 140
    merges; the id-like names add digit-heavy vocabulary)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text")
    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select(F.col("c_name").alias("text"))
    )
    return docs.unionAll(cust)


def _enriched_wc(sf_dir):
    import duckdb

    return dict(
        duckdb.sql(
            f"""SELECT w, count(*) FROM (
                  SELECT unnest(string_split(text, ' ')) AS w FROM (
                    SELECT text FROM read_parquet('{sf_dir}/documents.parquet')
                    UNION ALL
                    SELECT c_name FROM read_parquet('{sf_dir}/customer.parquet')))
                WHERE w <> '' GROUP BY w"""
        ).fetchall()
    )


def test_bpe_driver_256_matches_reference(spark, sf_dir):
    """The production path (one word-count job + driver-side exact
    sequential training with incremental pair updates) must equal the
    pure-Python reference for the full 256-merge table — VERDICT r15
    #4's 'past demo size' gate."""
    expect = _ref_bpe(_enriched_wc(sf_dir), n_merges=256)
    got = [
        (r.step, r.left, r.right, r.merged, r.pair_count)
        for r in C.bpe_merges_driver(_enriched_corpus(spark, sf_dir), 256)
        .orderBy("step")
        .collect()
    ]
    assert len(got) == 256
    assert got == expect


def test_bpe_driver_matches_distributed_prefix(spark, sf_dir):
    """Both training regimes are sequential-exact, so the distributed
    batched rounds must reproduce the driver path's prefix verbatim
    (x68 publishes this agreement as data)."""
    corpus = _enriched_corpus(spark, sf_dir)
    drv = [
        tuple(r)
        for r in C.bpe_merges_driver(corpus, 16).orderBy("step").collect()
    ]
    dist = [
        tuple(r)
        for r in C.bpe_merges(corpus, 16, batch=8, vocab_partitions=2)
        .orderBy("step")
        .collect()
    ]
    assert dist == drv


def test_bpe_driver_vocab_cap_raises(spark, sf_dir):
    with pytest.raises(ValueError, match="max_vocab_types"):
        C.bpe_merges_driver(
            _enriched_corpus(spark, sf_dir), 8, max_vocab_types=5
        )


def test_bpe_encode_parity_on_256_merge_table(spark, sf_dir):
    """Encode parity re-verified at the LARGER trained table (VERDICT
    r15 #4's second half): the Arrow canonical encoder under the
    256-merge table equals the pure-Python min-rank encoder on a
    bounded document sample."""
    corpus = _enriched_corpus(spark, sf_dir)
    merges_df = C.bpe_merges_driver(corpus, 256)
    table = [
        (r.left, r.right, r.merged)
        for r in merges_df.orderBy("step").collect()
    ]
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id") < 30)
        .select("doc_id", "text")
    )
    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .where(F.col("c_custkey") < 30)
        .select(
            (F.col("c_custkey") + 1_000_000).alias("doc_id"),
            F.col("c_name").alias("text"),
        )
    )
    sample = docs.unionAll(cust)
    got = {
        r.doc_id: list(r.bpe_tokens)
        for r in C.bpe_encode(sample, merges_df)
        .select("doc_id", "bpe_tokens")
        .collect()
    }
    for r in sample.collect():
        assert got[r.doc_id] == _ref_bpe_encode(r.text, table), r.doc_id
