"""Linear text-quality classifier (functions/classifier.py): cross-engine
bit-identity, hashing guards, and the distilled-weights contract."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from duckdb_nats_jetstream_spark.errors import BindError
from duckdb_nats_jetstream_spark.functions.classifier import (
    BAD_SEED_FEATURES,
    GOOD_SEED_FEATURES,
    MAX_LITERAL_BUCKETS,
    feature_bucket,
    feature_bucket_py,
    hashed_text_features,
    linear_margin,
    linear_margin_py,
    quality_classifier_weights,
    sql_linear_margin,
)
from duckdb_nats_jetstream_spark.operators.similarity import sql_lit_f64

#: ASCII-only alphabet: the three engines' lower()/\s+ semantics agree on
#: ASCII; exotic-unicode case folding is out of contract (as for every
#: text operator in the package — fixtures are ASCII).
_ALPHABET = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    " \t\n.,;:!?'-()"
)
_TEXTS = st.lists(
    st.text(alphabet=_ALPHABET, max_size=80), min_size=1, max_size=25
)

_W = quality_classifier_weights(64)
_BIAS = 0.0625  # dyadic, nonzero — exercises the bias term exactly


@settings(max_examples=12, deadline=None)
@given(_TEXTS)
def test_margin_spark_equals_python_reference(spark, texts):
    """The Spark column must reproduce the pure-Python reference
    BIT-FOR-BIT on arbitrary ASCII text (same normalization, same
    features, same bucket hash, same left-fold order)."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    got = {
        r.id: r.m
        for r in df.select(
            "id", linear_margin(F.col("text"), _W, _BIAS).alias("m")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == linear_margin_py(t, _W, _BIAS), (i, t)


@settings(max_examples=40, deadline=None)
@given(_TEXTS)
def test_margin_duckdb_equals_python_reference(texts):
    """The oracle-side SQL must also be bit-identical to the reference
    (cheap per example — this leg carries the bulk of the fuzzing)."""
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"id": range(len(texts)), "text": texts}))
    sql = f"SELECT id, {sql_linear_margin('text', _W, _BIAS)} AS m FROM t"
    for i, m in con.sql(sql).fetchall():
        assert m == linear_margin_py(texts[i], _W, _BIAS), (i, texts[i])


def test_margin_jvm_path_bit_equals_arrow_path(spark):
    """arrow=False (pure-JVM column fold) must reproduce the default
    Arrow path bit-for-bit — including NULL text and degenerate inputs
    (the proven-kernel twin-path discipline from with_srp_bucket)."""
    texts = [
        None,
        "",
        "solo",
        "the quick brown fox of the morning",
        "dup dup click here  spaced\tout",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    a = {
        r.id: r.m
        for r in df.select(
            "id", linear_margin(F.col("text"), _W, _BIAS, arrow=True).alias("m")
        ).collect()
    }
    j = {
        r.id: r.m
        for r in df.select(
            "id", linear_margin(F.col("text"), _W, _BIAS, arrow=False).alias("m")
        ).collect()
    }
    assert a == j


def test_hashed_feature_buckets_paths_agree(spark):
    """hashed_feature_buckets: Arrow (memoized) and JVM paths must emit
    the identical bucket sequence, and NULL text → NULL array on both."""
    from duckdb_nats_jetstream_spark.functions.classifier import (
        hashed_feature_buckets,
    )

    texts = [None, "", "solo", "the  quick\tbrown fox", "dup dup dup"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    a = {
        r.id: r.b
        for r in df.select(
            "id", hashed_feature_buckets(F.col("text"), 32, arrow=True).alias("b")
        ).collect()
    }
    j = {
        r.id: r.b
        for r in df.select(
            "id", hashed_feature_buckets(F.col("text"), 32, arrow=False).alias("b")
        ).collect()
    }
    assert a == j
    assert a[0] is None
    # reference: unigrams then bigrams through the python bucket hash
    toks = "dup dup dup".split(" ")
    want = [feature_bucket_py(f, 32) for f in toks] + [
        feature_bucket_py("dup dup", 32),
        feature_bucket_py("dup dup", 32),
    ]
    assert a[4] == want


def test_feature_bucket_cross_engine(spark):
    feats = ["", "a", "dup dup", "of the", "hello world", "123", "x'y"]
    df = spark.createDataFrame([(f,) for f in feats], "f string")
    got = {
        r.f: r.b
        for r in df.select(
            "f", feature_bucket(F.col("f"), 64).alias("b")
        ).collect()
    }
    con = duckdb.connect()
    for f in feats:
        want = feature_bucket_py(f, 64)
        assert got[f] == want
        (d,) = con.sql(
            "SELECT (('0x' || substr(md5('fb:' || ?), 1, 8))::BIGINT % 64)",
            params=[f],
        ).fetchone()
        assert d == want, f


def test_hashed_features_single_token_and_empty(spark):
    """The bigram branch guard: Spark's sequence(1, 0) is DESCENDING, so
    single-token (and whitespace-only → ['']) docs must yield unigrams
    only, never bogus reversed-index bigrams."""
    df = spark.createDataFrame(
        [("solo",), ("   ",), ("two words",)], "text string"
    )
    got = [
        r.f
        for r in df.select(hashed_text_features(F.col("text")).alias("f"))
        .collect()
    ]
    assert got[0] == ["solo"]
    assert got[1] == [""]
    assert got[2] == ["two", "words", "two words"]


def test_weights_are_exact_dyadic_literals():
    """Every default weight must survive the sql_lit_f64 round-trip
    exactly — the cross-engine fold is only bit-identical if the
    embedded literals parse back to the same doubles."""
    w = quality_classifier_weights(64)
    assert len(w) == 64
    con = duckdb.connect()
    for v in w:
        (parsed,) = con.sql(f"SELECT CAST({sql_lit_f64(v)} AS DOUBLE)").fetchone()
        assert parsed == v


def test_weights_seeding_moves_good_and_bad_buckets():
    base = []
    import hashlib

    for i in range(64):
        h = hashlib.md5(f"ltcw:{i}".encode()).hexdigest()
        base.append((int(h[:8], 16) % 257 - 128) / 1024.0)
    w = quality_classifier_weights(64)
    good_buckets = {feature_bucket_py(f, 64) for f in GOOD_SEED_FEATURES}
    bad_buckets = {feature_bucket_py(f, 64) for f in BAD_SEED_FEATURES}
    # seeded buckets moved off the noise floor (collisions may stack, so
    # compare to base, not to zero)
    for b in good_buckets - bad_buckets:
        assert w[b] > base[b]
    for b in bad_buckets - good_buckets:
        assert w[b] < base[b]


def test_n_buckets_guards():
    for bad in (0, -3):
        with pytest.raises(BindError, match="n_buckets"):
            quality_classifier_weights(bad)
    with pytest.raises(BindError, match="literal-weights bound"):
        quality_classifier_weights(MAX_LITERAL_BUCKETS + 1)
    with pytest.raises(BindError, match="n_buckets"):
        linear_margin(F.lit("x"), [], 0.0)


def test_margin_null_and_degenerate_text(spark):
    """r13 adversarial sweep: NULL text → NULL margin on BOTH engines
    (NULL tokens propagate through concat/transform/aggregate, and
    try_divide keeps ANSI mode from killing the job); empty and
    whitespace-only text normalize to [''] — ONE feature, a real margin,
    identical everywhere."""
    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "  \t ")], "id long, text string"
    )
    got = {
        r.id: r.m
        for r in df.select(
            "id", linear_margin(F.col("text"), _W, 0.5).alias("m")
        ).collect()
    }
    assert got[0] is None
    assert got[1] == got[2] == linear_margin_py("", _W, 0.5)
    con = duckdb.connect()
    con.register(
        "t", pd.DataFrame({"id": [0, 1, 2], "text": [None, "", "  \t "]})
    )
    duck = dict(
        con.sql(
            f"SELECT id, {sql_linear_margin('text', _W, 0.5)} AS m FROM t"
        ).fetchall()
    )
    assert duck == got


def test_classifier_signal_on_seeded_text(spark):
    """End-to-end sanity: seeded prose scores above seeded junk (the
    distilled model's one behavioral guarantee)."""
    df = spark.createDataFrame(
        [
            (0, "the quick brown fox and the lazy dog of the morning"),
            (1, "dup dup click here buy now free free zzz"),
        ],
        "id long, text string",
    )
    got = {
        r.id: r.m
        for r in df.select(
            "id", linear_margin(F.col("text"), _W, 0.0).alias("m")
        ).collect()
    }
    assert got[0] > 0 > got[1]
