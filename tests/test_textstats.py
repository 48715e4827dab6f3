"""Text-analysis operators: language ID, quality, token counts,
fingerprint."""

import hashlib

import pytest

from qurio_spark.operators.textstats import text_profile


@pytest.fixture(scope="module")
def profile(spark):
    rows = [
        (0, "The cat and the dog of the house, this is it."),  # en markers
        (1, "Der Hund und die Katze, das ist gut."),  # de markers
        (2, "Le chat et la maison, c'est est bon les jours."),  # fr markers
        (3, "El gato y los perros, es bueno en las casas."),  # es markers
        (4, "xyzzy qwerty asdf"),  # no markers
        (5, "A solid paragraph of natural english text that is long enough to pass the "
            "length gate and contains the usual distribution of the stopwords that a "
            "quality classifier is looking for in a document."),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {r["doc_id"]: r for r in text_profile(df).collect()}


class TestLangId:
    def test_marker_argmax(self, profile):
        assert profile[0]["lang_guess"] == "en"
        assert profile[1]["lang_guess"] == "de"
        assert profile[2]["lang_guess"] == "fr"
        assert profile[3]["lang_guess"] == "es"
        assert profile[4]["lang_guess"] == "und"


class TestQuality:
    def test_good_doc_scores_higher(self, profile):
        assert profile[5]["quality"] > profile[4]["quality"]

    def test_bounded(self, profile):
        for r in profile.values():
            assert 0.0 <= r["quality"] <= 1.0


class TestCounts:
    def test_token_count(self, profile):
        assert profile[4]["n_tokens"] == 3
        assert profile[4]["n_distinct_tokens"] == 3

    def test_nchars(self, profile):
        assert profile[4]["n_chars"] == len("xyzzy qwerty asdf")


class TestFingerprint:
    def test_sha256_of_normalized(self, profile):
        want = hashlib.sha256(b"xyzzy qwerty asdf").hexdigest()
        assert profile[4]["fingerprint"] == want


class TestPiiRedaction:
    """functions/text.redact_pii + pii_count goldens on PII-rich rows
    (the driver corpus is PII-free, so the oracle entry only proves
    engine parity of the expressions — behavior is pinned here)."""

    ROWS = [
        (1, "mail me at john.doe+x@example.co.uk now"),
        (2, "ssn 123-45-6789 phone 555.123.4567 alt 555-123-4567"),
        (3, "server at 10.0.255.1 port 80"),
        (4, "no pii here at all"),
        # phone-shaped run inside the email local-part: ONE redaction,
        # so n_pii must be 1, not 2 (counts are sequential like redact)
        (5, "reach me at 555-123-4567@corp.example.com ok"),
    ]

    def test_redaction_goldens(self, spark):
        from pyspark.sql import functions as F

        from qurio_spark.functions.text import pii_count, redact_pii

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["red"], r["n"])
            for r in df.select(
                "doc_id",
                redact_pii(F.col("text")).alias("red"),
                pii_count(F.col("text")).alias("n"),
            ).collect()
        }
        assert got[1] == ("mail me at [EMAIL] now", 1)
        assert got[2] == ("ssn [SSN] phone [PHONE] alt [PHONE]", 3)
        assert got[3] == ("server at [IP] port 80", 1)
        assert got[4] == ("no pii here at all", 0)
        assert got[5] == ("reach me at [EMAIL] ok", 1)

    def test_duckdb_parity_on_pii_rich_rows(self, spark):
        """The oracle SQL must agree with Spark on text that actually
        contains PII, not just on the PII-free driver corpus."""
        import duckdb

        from __spark_entry__ import _pii_sql
        from qurio_spark.operators.textstats import pii_profile

        sdf = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        got_s = {
            r["doc_id"]: (r["n_pii"], r["redacted_fp"])
            for r in pii_profile(sdf).collect()
        }
        con = duckdb.connect()
        con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", self.ROWS)
        got_d = {r[0]: (r[1], r[2]) for r in con.execute(_pii_sql()).fetchall()}
        assert got_s == got_d


class TestRepetitionMetrics:
    def test_word_concentration_tie_breaks_alphabetically(self, spark):
        from qurio_spark.operators.textstats import word_concentration

        df = spark.createDataFrame(
            [(1, "b b a a c"), (2, "x x x y")], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: (r["top_word"], r["top_word_frac"])
            for r in word_concentration(df).collect()
        }
        assert got[1] == ("a", 0.4)  # a and b tie at 2/5; 'a' wins
        assert got[2] == ("x", 0.75)

    def test_repetition_profile_bounds(self, spark):
        from qurio_spark.operators.textstats import repetition_profile

        df = spark.createDataFrame(
            [(1, "w w w w"), (2, "a b c d"), (3, "a b a b a b")],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: (r["distinct_word_ratio"], r["dup_2gram_frac"])
            for r in repetition_profile(df).collect()
        }
        assert got[1] == (0.25, 0.6667)  # "w w" x3 -> 1 distinct of 3
        assert got[2] == (1.0, 0.0)  # no repetition at all
        assert got[3][0] == 0.3333
        assert got[3][1] == 0.6  # "a b"/"b a" alternate: 2 distinct of 5


class TestKeywordExtract:
    def test_tfidf_ranks_deterministic(self, spark):
        from qurio_spark.operators.textstats import keyword_extract

        docs = spark.createDataFrame(
            [
                (1, "spark spark spark shuffle join"),
                (2, "join join shuffle common common common common"),
                (3, "common shuffle unique"),
            ],
            "doc_id long, text string",
        )
        out = keyword_extract(docs, topk=2).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["term"]))
        # 'spark' appears only in doc 1, 3 times -> its top keyword
        assert by_doc[1][0] == (1, "spark")
        # 'unique' is doc 3's only exclusive term
        assert by_doc[3][0] == (1, "unique")
        # every doc got exactly topk rows with ranks 1..k
        assert all(sorted(r for r, _ in v) == [1, 2] for v in by_doc.values())

    def test_ubiquitous_terms_score_zero(self, spark):
        from qurio_spark.operators.textstats import keyword_extract

        docs = spark.createDataFrame(
            [(1, "alpha beta"), (2, "alpha gamma")], "doc_id long, text string"
        )
        rows = {(r["doc_id"], r["term"]): r["tfidf"] for r in
                keyword_extract(docs, topk=2).collect()}
        # df == N -> ln(1) == 0
        assert rows[(1, "alpha")] == 0.0
        assert rows[(1, "beta")] > 0.0


class TestContaminationFlags:
    def test_flags_and_counts(self, spark):
        from qurio_spark.operators.dedup import contamination_flags

        bench = spark.createDataFrame(
            [(100, "alpha beta gamma delta epsilon zeta")],
            "doc_id long, text string",
        )
        train = spark.createDataFrame(
            [
                # contains the benchmark 5-gram "alpha beta gamma delta
                # epsilon" AND "beta gamma delta epsilon zeta" -> 2 shared
                (1, "intro alpha beta gamma delta epsilon zeta outro"),
                # shares only shorter runs -> clean at n=5
                (2, "alpha beta gamma nothing delta epsilon"),
                (3, "completely different words here entirely"),
            ],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r["n_shared_shingles"]
            for r in contamination_flags(train, bench, n=5).collect()
        }
        assert got == {1: 2}

    def test_short_docs_degenerate_shingle(self, spark):
        """Docs shorter than n collapse to one whole-text shingle (the
        word_ngrams contract) — exact short matches still flag."""
        from qurio_spark.operators.dedup import contamination_flags

        bench = spark.createDataFrame([(9, "tiny doc")], "doc_id long, text string")
        train = spark.createDataFrame(
            [(1, "tiny doc"), (2, "other thing")], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: r["n_shared_shingles"]
            for r in contamination_flags(train, bench, n=5).collect()
        }
        assert got == {1: 1}


class TestGopherRules:
    """operators/textstats.gopher_rules: each published rule (Rae et
    al. 2021 A1.1) exercised on a crafted doc that fails EXACTLY that
    rule while a control prose doc passes all seven — the synthetic
    corpus can only vary the word-count rule, so the per-rule
    semantics are pinned here."""

    PROSE = (
        "The quick brown fox jumps over the lazy dog and runs off to "
        "the woods with great speed because it wants to be far away "
        "from danger and noise of any kind that could have found it "
        "there during one of those long quiet afternoons full of sun "
        "and wind and the kind of calm that only open country has."
    )

    def _run(self, spark, rows):
        from qurio_spark.operators.textstats import gopher_rules

        df = spark.createDataFrame(rows, ["doc_id", "text"])
        return {r["doc_id"]: r.asDict() for r in gopher_rules(df).collect()}

    def test_each_rule_fails_exactly_its_doc(self, spark):
        long_words = "to be of and " + " ".join(
            ["pneumonoultramicroscopic"] * 60
        )
        symbols = "to be of and " + "alpha # beta # " * 20
        bullets = "to be of and word\n" + "\n".join(
            ["- bullet line"] * 30
        )
        ellipses = "to be of and word\n" + "\n".join(
            ["a trailing line..."] * 10
        )
        numeric = "to be of and " + " ".join(str(i) for i in range(60))
        no_stop = " ".join(["garden window river stone cloud"] * 12)
        rows = [
            (0, self.PROSE),
            (1, "too few words"),
            (2, long_words),
            (3, symbols),
            (4, bullets),
            (5, ellipses),
            (6, numeric),
            (7, no_stop),
        ]
        got = self._run(spark, rows)
        assert got[0]["gopher_pass"] == 1, got[0]
        failing_rule = {
            1: "r_word_count",
            2: "r_mean_word_len",
            3: "r_symbol_ratio",
            4: "r_bullet_lines",
            5: "r_ellipsis_lines",
            6: "r_alpha_words",
            7: "r_stopwords",
        }
        for doc, rule in failing_rule.items():
            assert got[doc][rule] == 0, (doc, rule, got[doc])
            assert got[doc]["gopher_pass"] == 0, (doc, got[doc])

    def test_empty_and_blank_docs_fail_safely(self, spark):
        got = self._run(spark, [(0, ""), (1, "   \n  \n ")])
        for d in (0, 1):
            assert got[d]["gopher_pass"] == 0
            assert got[d]["r_word_count"] == 0
            # line rules are vacuously true on empty docs (the rule
            # gates bullet/ellipsis EXCESS, not presence)
            assert got[d]["r_bullet_lines"] == 1
            assert got[d]["r_ellipsis_lines"] == 1

    def test_boundaries_inclusive(self, spark):
        """50 words exactly passes the count rule; mean length 3.0 and
        10.0 exactly pass the mean-word-length rule."""
        fifty = " ".join(["the", "and"] + ["cat"] * 48)  # mean len 3.0
        got = self._run(spark, [(0, fifty)])
        assert got[0]["r_word_count"] == 1
        assert got[0]["r_mean_word_len"] == 1  # exactly 3.0, inclusive


class TestBigramLm:
    """operators/lm: CCNet-shaped bigram-LM cross-entropy scoring."""

    def _score(self, spark, rows, train_rows, max_vocab=100):
        from qurio_spark.operators.lm import lm_cross_entropy

        docs = spark.createDataFrame(rows, "doc_id int, text string")
        train = spark.createDataFrame(train_rows, "doc_id int, text string")
        return {
            r["doc_id"]: (r["n_bigrams"], r["cost_millinats"])
            for r in lm_cross_entropy(docs, train, max_vocab=max_vocab).collect()
        }

    def test_hand_computed_exact(self, spark):
        import math

        # train: "a b a b" -> uni: a=2, b=2; bi: (a,b)=2, (b,a)=1;
        # vocab = {a, b}, V = 3
        train = [(0, "a b a b")]
        out = self._score(spark, [(1, "a b"), (2, "b b")], train)
        # doc 1: one bigram (a,b): cost = floor(1000*(ln(2+3)-ln(2+1)))
        want_ab = math.floor(1000 * (math.log(5) - math.log(3)))
        assert out[1] == (1, want_ab)
        # doc 2: (b,b): c2=0 -> floor(1000*(ln(2+3)-ln(1)))
        want_bb = math.floor(1000 * (math.log(5) - math.log(1)))
        assert out[2] == (1, want_bb)

    def test_oov_maps_to_unk(self, spark):
        import math

        # max_vocab=1 keeps only the most frequent token 'a' (count 3
        # beats b=2); b and z both become <unk>, so the trained
        # bigrams collapse: (a,<unk>)=2, (<unk>,a)=1; uni: a=3, unk=2;
        # V = 2.
        train = [(0, "a b a b a")]
        out = self._score(spark, [(1, "a z")], train, max_vocab=1)
        # (a,<unk>): c1(a)=3, c2=2 -> floor(1000*(ln(3+2)-ln(3)))
        want = math.floor(1000 * (math.log(5) - math.log(3)))
        assert out[1] == (1, want)

    def test_short_docs_score_zero(self, spark):
        out = self._score(
            spark, [(1, "solo"), (2, ""), (3, "two tokens")], [(0, "two tokens")]
        )
        assert out[1] == (0, 0)
        assert out[2] == (0, 0)
        assert out[3][0] == 1

    def test_unseen_context_uses_v_floor(self, spark):
        import math

        # context never seen in train: c1=0, c2=0 ->
        # floor(1000*(ln(0+V)-ln(1))) per bigram, V = |vocab|+1
        train = [(0, "a b")]
        out = self._score(spark, [(1, "q r")], train)
        want = math.floor(1000 * math.log(3))  # V = 3 (a, b, unk)
        assert out[1] == (1, want)


class TestDsirWeights:
    """operators/dsir: hashed-ngram importance weights."""

    def _run(self, spark, raw_rows, target_rows, n_buckets=4096):
        from qurio_spark.operators.dsir import dsir_weights

        raw = spark.createDataFrame(raw_rows, "doc_id int, text string")
        target = spark.createDataFrame(target_rows, "doc_id int, text string")
        return {
            r["doc_id"]: (r["n_tokens"], r["logw_millinats"])
            for r in dsir_weights(raw, target, n_buckets=n_buckets).collect()
        }

    def test_hand_computed_exact(self, spark):
        import math

        from qurio_spark.functions.hashing import hash64_py

        # distinct buckets for a/b at 4096 (verified below); raw has
        # a x2 + b x1, target has a x1 only.
        ba = hash64_py("ds:a") % 4096
        bb = hash64_py("ds:b") % 4096
        assert ba != bb
        out = self._run(spark, [(1, "a a b")], [(9, "a")])
        # token a: ln(1+1) - ln(2+1); token b: ln(0+1) - ln(1+1)
        wa = math.floor(1000 * (math.log(2) - math.log(3)))
        wb = math.floor(1000 * (math.log(1) - math.log(2)))
        assert out[1] == (3, 2 * wa + wb)

    def test_target_like_scores_higher(self, spark):
        # a doc made of target-domain tokens must outscore one made of
        # tokens absent from the target
        out = self._run(
            spark,
            [(1, "alpha beta alpha beta"), (2, "zeta yotta zeta yotta")],
            [(9, "alpha beta alpha beta alpha")],
        )
        assert out[1][1] > out[2][1]

    def test_empty_doc_scores_zero(self, spark):
        out = self._run(spark, [(1, ""), (2, "alpha")], [(9, "alpha")])
        assert out[1] == (0, 0)
        assert out[2][0] == 1


class TestLmBuckets:
    def test_equal_frequency_and_head_is_cheapest(self, spark):
        from qurio_spark.operators.lm import lm_buckets

        # 9 scoreable docs in one source: ntile(3) -> 3/3/3, and the
        # head bucket must hold the lowest per-bigram costs
        docs = spark.createDataFrame(
            [(i, "s", "a b " * (2 + i)) for i in range(9)]
            + [(99, "s", "solo")],  # no bigrams -> dropped
            "doc_id int, source string, text string",
        )
        train = spark.createDataFrame(
            [(0, "a b a b a b")], "doc_id int, text string"
        )
        rows = lm_buckets(docs, train, n_buckets=3).collect()
        assert len(rows) == 9 and all(r["doc_id"] != 99 for r in rows)
        by_bucket = {}
        for r in rows:
            by_bucket.setdefault(r["bucket"], []).append(
                r["cost_millinats"] / r["n_bigrams"]
            )
        assert {k: len(v) for k, v in by_bucket.items()} == {1: 3, 2: 3, 3: 3}
        assert max(by_bucket[1]) <= min(by_bucket[2]) <= min(by_bucket[3])

    def test_sources_bucket_independently(self, spark):
        from qurio_spark.operators.lm import lm_buckets

        docs = spark.createDataFrame(
            [(i, f"s{i % 2}", "x y " * 3) for i in range(6)],
            "doc_id int, source string, text string",
        )
        train = docs.select("doc_id", "text")
        rows = lm_buckets(docs, train, n_buckets=3).collect()
        per_src = {}
        for r in rows:
            per_src.setdefault(r["source"], []).append(r["bucket"])
        # 3 docs per source -> each gets buckets {1, 2, 3} of its own
        assert {s: sorted(b) for s, b in per_src.items()} == {
            "s0": [1, 2, 3], "s1": [1, 2, 3],
        }

    def test_ntile_arithmetic_matches_spark_ntile(self, spark):
        """The r14 exact path derives ntile from (distributed rank, T,
        n) arithmetically; it must reproduce Spark's ntile on BOTH the
        remainder case (T=10, n=3 -> 4/3/3) and the T < n case (q=0 —
        the branch where the divisor would be zero if evaluated)."""
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        from qurio_spark.operators.lm import lm_buckets

        train = spark.createDataFrame(
            [(0, "a b a b a b")], "doc_id int, text string"
        )
        for n_docs, n_buckets in ((10, 3), (2, 3)):
            docs = spark.createDataFrame(
                [(i, "s", "a b " * (2 + i)) for i in range(n_docs)],
                "doc_id int, source string, text string",
            )
            got = lm_buckets(docs, train, n_buckets=n_buckets)
            ref = got.select("doc_id", "source", "n_bigrams",
                             "cost_millinats").withColumn(
                "bucket",
                F.ntile(n_buckets).over(
                    Window.partitionBy("source").orderBy(
                        (F.col("cost_millinats") / F.col("n_bigrams")).asc(),
                        F.col("doc_id").asc(),
                    )
                ).cast("long"),
            )
            g = {r["doc_id"]: r["bucket"] for r in got.collect()}
            w = {r["doc_id"]: r["bucket"] for r in ref.collect()}
            assert g == w, (n_docs, n_buckets, g, w)

    def test_approx_path_matches_exact_on_distinct_ratios(self, spark):
        """exact=False (broadcast percentile cutoffs, no per-source
        window — the 100-TB path) must agree with the exact ntile when
        per-bigram ratios are distinct and bucket sizes divide evenly;
        in general its bucket is a monotone function of the ratio."""
        from qurio_spark.operators.lm import lm_buckets

        docs = spark.createDataFrame(
            [(i, "s", "a b " * (2 + i)) for i in range(9)],
            "doc_id int, source string, text string",
        )
        train = spark.createDataFrame(
            [(0, "a b a b a b")], "doc_id int, text string"
        )
        exact = {
            r["doc_id"]: r["bucket"]
            for r in lm_buckets(docs, train, n_buckets=3).collect()
        }
        approx = {
            r["doc_id"]: r["bucket"]
            for r in lm_buckets(docs, train, n_buckets=3, exact=False).collect()
        }
        assert set(approx.values()) <= {1, 2, 3}
        # monotone: sort docs by exact bucket; approx buckets must be
        # non-decreasing along the same ratio order
        assert approx == exact

    def test_approx_path_survives_persist_false(self, spark):
        """r15 (ADVICE r14): the approx bucket is a sum of element_at
        comparisons, not a higher-order-function lambda — the HOF form
        crashed with INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND when
        persist=False duplicated the scored frame's lineage."""
        from qurio_spark.operators.lm import lm_buckets

        docs = spark.createDataFrame(
            [(i, "s", "a b " * (2 + i)) for i in range(9)],
            "doc_id int, source string, text string",
        )
        train = spark.createDataFrame(
            [(0, "a b a b a b")], "doc_id int, text string"
        )
        exact = {
            r["doc_id"]: r["bucket"]
            for r in lm_buckets(docs, train, n_buckets=3).collect()
        }
        approx = {
            r["doc_id"]: r["bucket"]
            for r in lm_buckets(
                docs, train, n_buckets=3, exact=False, persist=False
            ).collect()
        }
        assert approx == exact

    def test_approx_bucketing_never_shuffles_the_corpus(self, spark):
        """The 100-TB selection path's core claim (VERDICT r14 missing
        #3): past the persisted scoring subtree, exact=False adds ONE
        exchange — the per-source percentile sketch aggregation, which
        carries partial-agged sketches, not corpus rows — and a
        broadcast join back.  Count live (non-cached) exchanges in the
        executed plan."""
        from qurio_spark.operators.cachectl import release_caches
        from qurio_spark.operators.lm import lm_buckets

        docs = spark.createDataFrame(
            [(i, f"s{i % 2}", "a b " * (2 + i)) for i in range(40)],
            "doc_id int, source string, text string",
        )
        train = spark.createDataFrame(
            [(0, "a b a b a b")], "doc_id int, text string"
        )
        out = lm_buckets(docs, train, n_buckets=3, exact=False)
        out.collect()
        from tools.plan_audit import count_exchanges, live_lines

        live = live_lines(out)  # everything outside cached subtrees
        assert count_exchanges(live) <= 1, "\n".join(live)
        assert any("BroadcastExchange" in l for l in live), "\n".join(live)
        release_caches(out)

    def test_lm_buckets_cache_release(self, spark):
        """r15 cache-lifetime contract: the persisted scored frame is
        attached to the result and released deterministically."""
        from qurio_spark.operators.cachectl import cached_frames, release_caches
        from qurio_spark.operators.lm import lm_buckets

        docs = spark.createDataFrame(
            [(i, "s", "a b " * (2 + i)) for i in range(6)],
            "doc_id int, source string, text string",
        )
        train = spark.createDataFrame(
            [(0, "a b a b a b")], "doc_id int, text string"
        )
        out = lm_buckets(docs, train, n_buckets=3)
        frames = cached_frames(out)
        assert len(frames) == 1
        out.count()
        assert frames[0].storageLevel.useMemory
        assert release_caches(out) == 1
        assert not frames[0].storageLevel.useMemory


class TestDsirBareTarget:
    def test_target_without_id_column(self, spark):
        # the TARGET distribution needs only text — a bare-text frame
        # (the natural shape for a small reference corpus) must work
        from qurio_spark.operators.dsir import dsir_weights

        raw = spark.createDataFrame(
            [(1, "alpha beta"), (2, "zeta yotta")], "doc_id int, text string"
        )
        target = spark.createDataFrame([("alpha beta alpha",)], "text string")
        out = {
            r["doc_id"]: r["logw_millinats"]
            for r in dsir_weights(raw, target).collect()
        }
        assert out[1] > out[2]
