"""Round-11 capstone economy (VERDICT r10 item #6): the dedup-ladder
capstone's four shingle-based legs share ONE persisted token frame
instead of re-scanning and re-splitting the corpus per leg. The
contract is bit-identical output: grams derive from the same token
arrays whether the caller passes ``tokens=`` or lets each builder
tokenize for itself. These tests pin that equivalence on the real
fixture corpus, including the short-document edge (docs shorter than
the shingle length must vanish from the gram frame either way, and
the CASE-WHEN descending-sequence guard must still hold)."""

from __future__ import annotations

import pytest

from spark_flink_streaming_example_with_test_spark.operators import dedup as dd
from spark_flink_streaming_example_with_test_spark.sources.tables import load_table


def _rows(df):
    return sorted(map(str, df.collect()))


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def tok(spark, docs):
    t = dd.tokenized_docs(docs)
    yield t


@pytest.mark.parametrize("shingle_len", [3, 5, 8])
def test_shingle_sets_identical_with_shared_tokens(docs, tok, shingle_len):
    direct = dd.shingle_sets(docs, shingle_len=shingle_len)
    shared = dd.shingle_sets(docs, shingle_len=shingle_len, tokens=tok)
    assert _rows(direct) == _rows(shared)


def test_hashed_shingle_sets_identical_with_shared_tokens(docs, tok):
    direct = dd.hashed_shingle_sets(docs, shingle_len=3)
    shared = dd.hashed_shingle_sets(docs, shingle_len=3, tokens=tok)
    assert _rows(direct) == _rows(shared)


def test_jaccard_pairs_identical_with_shared_tokens(docs, tok):
    direct = dd.ngram_jaccard_pairs(docs, shingle_len=3, threshold=0.4)
    shared = dd.ngram_jaccard_pairs(
        docs, shingle_len=3, threshold=0.4, tokens=tok
    )
    assert _rows(direct) == _rows(shared)


def test_containment_pairs_identical_with_shared_tokens(docs, tok):
    direct = dd.containment_pairs(docs, shingle_len=5, threshold=0.5)
    shared = dd.containment_pairs(
        docs, shingle_len=5, threshold=0.5, tokens=tok
    )
    assert _rows(direct) == _rows(shared)


def test_shared_gram_pairs_identical_with_shared_tokens(docs, tok):
    direct = dd.shared_gram_pairs(docs, window_len=8)
    shared = dd.shared_gram_pairs(docs, window_len=8, tokens=tok)
    assert _rows(direct) == _rows(shared)


def test_minhash_identical_with_shared_tokens(docs, tok):
    direct = dd.minhash_near_duplicates(docs, threshold=0.5)
    shared = dd.minhash_near_duplicates(docs, threshold=0.5, tokens=tok)
    assert _rows(direct) == _rows(shared)


def test_short_docs_filtered_identically(spark):
    """Docs shorter than the shingle length drop out of the gram
    frame on BOTH paths — the shared-token path applies the length
    filter post-hoc, the direct path inside _tokenized; a 1-token
    doc must not trip the descending-sequence guard either way."""
    df = spark.createDataFrame(
        [(1, "a"), (2, "a b"), (3, "a b c"), (4, "a b c d e f g h i")],
        "doc_id int, text string",
    )
    tok = dd.tokenized_docs(df)
    for n in (3, 8):
        direct = dd.shingle_sets(df, shingle_len=n)
        shared = dd.shingle_sets(df, shingle_len=n, tokens=tok)
        assert _rows(direct) == _rows(shared)
        # every surviving doc has >= n tokens; shorter docs emit
        # empty shingle arrays or are filtered, never phantom grams
        for row in shared.collect():
            for g in row.shingles:
                assert len(g.split(" ")) == n


# ---------------------------------------------------------------------------
# Property: shared-token equivalence on ADVERSARIAL corpora — tiny
# alphabet (forced gram collisions), empty strings, docs straddling
# every shingle-length boundary. The fixture tests above prove the
# real corpus; this proves the class.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    texts=st.lists(
        st.lists(st.sampled_from("ab"), min_size=0, max_size=11).map(
            lambda ws: " ".join(ws)
        ),
        min_size=1,
        max_size=8,
    ),
)
def test_property_shared_tokens_equivalence(spark, texts):
    """For arbitrary tiny-alphabet corpora, every builder in the
    shingle family emits IDENTICAL rows whether it tokenizes for
    itself or consumes a shared tokenized_docs frame."""
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    tok = dd.tokenized_docs(df)
    for n in (2, 3, 5):
        assert _rows(dd.shingle_sets(df, shingle_len=n)) == _rows(
            dd.shingle_sets(df, shingle_len=n, tokens=tok)
        )
    assert _rows(dd.hashed_shingle_sets(df, shingle_len=3)) == _rows(
        dd.hashed_shingle_sets(df, shingle_len=3, tokens=tok)
    )
    assert _rows(
        dd.ngram_jaccard_pairs(df, shingle_len=2, threshold=0.0)
    ) == _rows(
        dd.ngram_jaccard_pairs(df, shingle_len=2, threshold=0.0, tokens=tok)
    )
