"""Property-based hardening (hypothesis): the proto wire codec must roundtrip
arbitrary values; decode must never crash on arbitrary bytes; text metrics
hold their invariants. Pure-python properties — no SparkSession needed, so
hundreds of examples run in seconds."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

from duckdb_nats_jetstream_spark.functions.proto import (
    decode_message,
    encode_message,
    parse_proto,
)
from tests.test_proto import TYPES_PROTO

MESSAGES, ENUMS = parse_proto(TYPES_PROTO)
DESC = MESSAGES["AllTypes"]

value_strategy = st.fixed_dictionaries(
    {},
    optional={
        "str_field": st.text(max_size=200),
        "bytes_field": st.binary(max_size=200),
        "int32_field": st.integers(-(2**31), 2**31 - 1),
        "sint32_field": st.integers(-(2**31), 2**31 - 1),
        "sfixed32_field": st.integers(-(2**31), 2**31 - 1),
        "int64_field": st.integers(-(2**63), 2**63 - 1),
        "sint64_field": st.integers(-(2**62), 2**62 - 1),
        "sfixed64_field": st.integers(-(2**63), 2**63 - 1),
        "uint32_field": st.integers(0, 2**32 - 1),
        "fixed32_field": st.integers(0, 2**32 - 1),
        "uint64_field": st.integers(0, 2**63 - 1),  # long-narrowed domain
        "fixed64_field": st.integers(0, 2**63 - 1),
        "double_field": st.floats(allow_nan=False),
        "bool_field": st.booleans(),
        "status_field": st.sampled_from(["UNKNOWN", "ACTIVE", "INACTIVE"]),
    },
)


@settings(max_examples=300, deadline=None)
@given(value_strategy)
def test_proto_roundtrip_arbitrary_values(values):
    data = encode_message(values, DESC, MESSAGES, ENUMS)
    out = decode_message(data, DESC, MESSAGES, ENUMS)
    assert out == values


@settings(max_examples=150, deadline=None)
@given(st.floats(width=32, allow_nan=True))
def test_proto_float_field_roundtrip(f):
    data = encode_message({"float_field": f}, DESC, MESSAGES, ENUMS)
    out = decode_message(data, DESC, MESSAGES, ENUMS)
    got = out["float_field"]
    assert (math.isnan(got) and math.isnan(f)) or got == f


@settings(max_examples=500, deadline=None)
@given(st.binary(max_size=300))
def test_proto_decode_never_crashes(data):
    """Arbitrary bytes either decode or raise ValueError — nothing else."""
    try:
        decode_message(data, DESC, MESSAGES, ENUMS)
    except ValueError:
        pass


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=120))
def test_proto_decode_prefix_stability(data):
    """A valid encoding with trailing garbage either fails cleanly or parses
    the valid prefix — never wrong-typed values."""
    base = encode_message({"int32_field": 7, "str_field": "x"}, DESC, MESSAGES, ENUMS)
    try:
        out = decode_message(base + data, DESC, MESSAGES, ENUMS)
    except ValueError:
        return
    assert isinstance(out.get("int32_field", 0), int)
    assert isinstance(out.get("str_field", ""), str)


# --- stdlib image codec -------------------------------------------------------

import numpy as np

from duckdb_nats_jetstream_spark.functions.imagecodec import (
    png_decode,
    png_encode,
    probe,
    resize_nearest,
)


@settings(max_examples=60, deadline=None)
@given(
    st.integers(1, 24),
    st.integers(1, 24),
    st.sampled_from([1, 2, 3, 4]),
    st.integers(0, 2**32 - 1),
)
def test_png_roundtrip_arbitrary_images(h, w, ch, seed):
    rng = np.random.RandomState(seed % (2**31))
    arr = rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)
    data = png_encode(arr)
    assert probe(data) == ("png", w, h)
    assert np.array_equal(png_decode(data), arr)


@settings(max_examples=120, deadline=None)
@given(st.binary(max_size=256))
def test_probe_never_crashes(data):
    fmt, w, h = probe(data)
    assert fmt is None or isinstance(fmt, str)


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 20), st.integers(1, 20), st.integers(1, 16), st.integers(1, 16))
def test_resize_nearest_shape_and_value_domain(h, w, nh, nw):
    arr = (np.arange(h * w * 3) % 251).astype(np.uint8).reshape(h, w, 3)
    out = resize_nearest(arr, nw, nh)
    assert out.shape == (nh, nw, 3)
    # every output pixel is an input pixel (nearest-neighbor invariant)
    flat_in = {tuple(p) for p in arr.reshape(-1, 3)}
    assert all(tuple(p) in flat_in for p in out.reshape(-1, 3))


# --- winnowing reference implementation --------------------------------------

import hashlib as _hl


def _winnow_ref(text: str, k: int = 8, w: int = 4) -> set[str]:
    """Independent pure-Python winnowing: k-gram md5-prefix hashes, w-window
    minima, dedupe — the spec the Spark column pipeline must match."""
    t = text.lower()
    grams = [
        _hl.md5(t[i : i + k].encode("utf-8")).hexdigest()[:8]
        for i in range(len(t) - k + 1)
    ]
    if not grams:
        return set()
    n_win = max(len(grams) - w + 1, 1)
    return {min(grams[i : i + w]) for i in range(n_win)}


@settings(max_examples=200, deadline=None)
@given(
    st.text(alphabet="abcd ", min_size=11, max_size=40),  # >= k+w-1 = 11
    st.text(alphabet="xyz ", max_size=20),
    st.text(alphabet="xyz ", max_size=20),
    st.text(alphabet="uvw ", max_size=20),
    st.text(alphabet="uvw ", max_size=20),
)
def test_winnow_shared_run_guarantee_two_docs(run, pre_a, post_a, pre_b, post_b):
    """THE MOSS guarantee (r09 property pin): any two documents sharing a
    verbatim run of >= w + k - 1 characters share at least one selected
    fingerprint — winnowing picks a window minimum from every w
    consecutive grams, and a shared run of that length contains one full
    window whose grams (hence minimum) are identical in both docs. This
    is what makes the pair self-join complete w.r.t. long clones."""
    doc_a = pre_a + run + post_a
    doc_b = pre_b + run + post_b
    assert _winnow_ref(doc_a) & _winnow_ref(doc_b), (
        f"no shared fingerprint for shared run {run!r}"
    )


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(codec="ascii", exclude_characters="\x00"), max_size=60))
def test_winnow_reference_guarantee(text):
    # any doc sharing an identical >= k+w-1 run with itself trivially shares
    # fingerprints; here: selection is a subset of gram hashes and nonempty
    # whenever a gram exists
    fps = _winnow_ref(text)
    t = text.lower()
    grams = {
        _hl.md5(t[i : i + 8].encode("utf-8")).hexdigest()[:8]
        for i in range(len(t) - 7)
    }
    assert fps <= grams
    assert bool(fps) == bool(grams)


# --- NATS wildcard translation ------------------------------------------------

import re as _re

from duckdb_nats_jetstream_spark.sources.message_scan import nats_wildcard_regex


def _nats_match_ref(pattern: str, subject: str) -> bool:
    """Independent NATS wildcard matcher: token-wise walk."""
    ptoks = pattern.split(".")
    stoks = subject.split(".")
    for i, p in enumerate(ptoks):
        if p == ">":
            return len(stoks) >= i + 1 and all(t != "" for t in stoks[i:])
        if i >= len(stoks):
            return False
        if p == "*":
            if stoks[i] == "":
                return False
        elif p != stoks[i]:
            return False
    return len(stoks) == len(ptoks)


_token = st.text(alphabet="abcu123", min_size=1, max_size=4)
_literal = st.lists(_token, min_size=1, max_size=4).map(".".join)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.one_of(_token, st.just("*")), min_size=1, max_size=4),
    st.booleans(),
    _literal,
)
def test_nats_wildcard_regex_matches_reference(ptoks, add_tail, subject):
    pattern = ".".join(ptoks + ([">"] if add_tail else []))
    regex = nats_wildcard_regex(pattern)
    assert bool(_re.fullmatch(regex[1:-1], subject)) == _nats_match_ref(
        pattern, subject
    ), (pattern, subject)


# --- Misra-Gries sketch invariants --------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from("abcdefgh"), st.integers(1, 50)), max_size=40
    ),
    st.integers(1, 6),
)
def test_misra_gries_error_bound(workload, k):
    from collections import Counter

    from duckdb_nats_jetstream_spark.streaming.heavyhitters import _mg_merge

    counters: dict = {}
    exact: Counter = Counter()
    for tok, c in workload:
        _mg_merge(counters, tok, c, k)
        exact[tok] += c
    n = sum(exact.values())
    err = n / (k + 1)
    assert len(counters) <= k
    for tok, true in exact.items():
        if true > err:
            assert tok in counters  # every true heavy hitter survives
        if tok in counters:
            assert true - err <= counters[tok] <= true  # bounded undercount


# --- prefix containment completeness ------------------------------------------


@settings(max_examples=100, deadline=None)
@given(st.data())
def test_prefix_containment_reference(data):
    """Blocked operator logic == the obvious O(n²) reference on random
    corpora with planted truncations (pure-python replica of the same
    block+predicate, validating the blocking never loses a pair for docs
    >= block_chars)."""
    words = ["alpha", "beta", "gamma", "delta", "epsi", "zeta"]
    docs = {}
    n = data.draw(st.integers(2, 8))
    for i in range(n):
        base = " ".join(data.draw(st.sampled_from(words)) for _ in range(12))
        docs[i] = base
        if data.draw(st.booleans()):
            cut = data.draw(st.integers(32, len(base)))
            docs[100 + i] = base[:cut]
    B = 32
    expected = {
        (a, b)
        for a in docs
        for b in docs
        if a != b
        and len(docs[a]) >= B
        and len(docs[b]) >= B
        and len(docs[a]) <= len(docs[b])
        and docs[b].startswith(docs[a])
        and (len(docs[a]) < len(docs[b]) or a < b)
    }
    # blocked replica: group by first-32-chars, pair within blocks only
    from collections import defaultdict

    blocks = defaultdict(list)
    for i, t in docs.items():
        if len(t) >= B:
            blocks[t[:B]].append(i)
    got = set()
    for ids in blocks.values():
        for a in ids:
            for b in ids:
                if (
                    a != b
                    and len(docs[a]) <= len(docs[b])
                    and docs[b].startswith(docs[a])
                    and (len(docs[a]) < len(docs[b]) or a < b)
                ):
                    got.add((a, b))
    assert got == expected


def test_bpe_oracle_survives_merge_exhaustion(spark):
    """When the corpus runs out of merge pairs before `rounds`, the Spark
    trainer breaks out of its loop keeping the encoding; the unrolled SQL
    mirror's per-round CTE must be a NO-OP then, not a vocabulary-wiping
    empty cross join (r10 sweep)."""
    import duckdb

    from duckdb_nats_jetstream_spark.operators.bpe import (
        bpe_token_counts,
        sql_bpe_token_counts,
    )

    rows = [(0, "ab ab"), (1, "ab")]  # one merge possible, then exhausted
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        map(tuple, bpe_token_counts(df, rounds=5).collect())
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = sorted(map(tuple, con.execute(sql_bpe_token_counts(rounds=5)).fetchall()))
    assert got == want and len(got) > 0


# --- retrieval: n-gram builder + phrase BM25 (r11) -----------------------------

_VOCAB = ["fast", "scan", "join", "a", "b", ""]


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=12),
    st.integers(1, 4),
)
def test_sql_ngrams_matches_python_sliding_window(toks, n):
    """DuckDB `_sql_ngrams(n)` over a 1-indexed list column must equal the
    Python sliding window (empty below n tokens) — including empty-string
    tokens, which TX.tokens emits for empty text."""
    import duckdb

    from duckdb_nats_jetstream_spark.operators.retrieval import _sql_ngrams

    con = duckdb.connect()
    got = con.execute(
        f"SELECT {_sql_ngrams(n)} FROM (SELECT $1::VARCHAR[] AS toks)", [toks]
    ).fetchone()[0]
    want = (
        [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        if len(toks) >= n
        else []
    )
    assert got == want


def _py_phrase_bm25(texts, phrases, k1=1.5, b=0.75):
    """Pure-Python mirror of bm25_phrase_scored: phrase tf over the n-gram
    window, document length in TOKENS, SAME operation order (bit-exact)."""
    toks = [t.split(" ") for t in texts]
    n = len(texts)
    dls = [len(tk) for tk in toks]
    avgdl = float(sum(dls)) / n

    def tf_of(tk, phrase):
        w = phrase.split(" ")
        m = len(w)
        if len(tk) < m:
            return 0
        return sum(1 for i in range(len(tk) - m + 1) if tk[i : i + m] == w)

    dfs = [sum(1 for tk in toks if tf_of(tk, p) > 0) for p in phrases]
    out = []
    for tk, dl in zip(toks, dls):
        score = 0.0
        for p, df in zip(phrases, dfs):
            tf = tf_of(tk, p)
            idf = (n - df + 0.5) / (df + 0.5)
            denom = tf + k1 * ((1.0 - b) + b * (dl / avgdl))
            score = score + idf * (tf * (k1 + 1.0)) / denom
        out.append(score)
    return out


_WORDS = ["fast", "scan", "join", "hash", "x"]


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=8).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=3).map(" ".join),
        min_size=1,
        max_size=3,
        unique=True,
    ),
)
def test_sql_phrase_bm25_matches_python_reference(texts, phrases):
    """The DuckDB phrase-BM25 oracle must match the Python reference
    BIT-EXACTLY on arbitrary small corpora (same op order throughout) —
    the same contract the driver's hash-compare enforces for the Spark
    twin at sf0.01."""
    import duckdb

    from duckdb_nats_jetstream_spark.operators.retrieval import (
        sql_bm25_phrase_scored,
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(texts))
    )
    got = dict(con.execute(sql_bm25_phrase_scored(phrases)).fetchall())
    want = {i: s for i, s in enumerate(_py_phrase_bm25(texts, phrases))}
    assert got == want


# --- r12: the tiled fold_gram kernel must be bitwise-equal to the naive
# fold on ARBITRARY shapes and magnitudes (the fixed-shape pins live in
# tests/test_vector_np.py; this drives the tile-boundary space and wild
# exponents, where a reordered accumulation would show up as ulp drift).

import numpy as np

from duckdb_nats_jetstream_spark.functions.vector_np import fold_gram


@settings(max_examples=60, deadline=None)
@given(
    st.integers(1, 600),
    st.integers(1, 40),
    st.integers(0, 8),
    st.integers(0, 2**32 - 1),
    st.integers(-12, 12),
)
def test_fold_gram_tiled_bitwise_equals_naive_fold(n, m, d, seed, scale):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, d)) * (10.0 ** scale)
    b = rng.standard_normal((m, d))
    acc = np.zeros((n, m))
    for i in range(d):
        acc = acc + np.outer(a[:, i], b[:, i])
    got = fold_gram(a, b)
    assert got.shape == acc.shape
    assert np.array_equal(got.view(np.uint64), acc.view(np.uint64))
