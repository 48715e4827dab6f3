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
