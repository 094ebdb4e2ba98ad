"""Property-based hardening for the sketch family — pure-Python replicas of
the row-local sketch math (the Spark/DuckDB twins are pinned to each other
by the oracle gate; these pin the MATH to its paper contract over hundreds
of arbitrary inputs, no SparkSession needed)."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings, strategies as st

# --- pure-python replicas of the row-local expressions -----------------------


def hll_register_rank(v) -> tuple[int, int]:
    h = hashlib.md5(f"hll:{v}".encode()).hexdigest()
    reg = int(h[:2], 16)
    rest = h[2:]
    lead0 = len(rest) - len(rest.lstrip("0"))
    if lead0 >= 30:
        return reg, 60
    nz = int(rest[lead0], 16)
    nlz = 0 if nz >= 8 else 1 if nz >= 4 else 2 if nz >= 2 else 3
    return reg, min(4 * lead0 + nlz + 1, 60)


def hll_registers(values) -> dict[int, int]:
    regs: dict[int, int] = {}
    for v in values:
        r, k = hll_register_rank(v)
        regs[r] = max(regs.get(r, 0), k)
    return regs


def hll_denom(regs: dict[int, int], m: int = 256) -> float:
    return (m - len(regs)) + sum(2.0 ** -k for k in regs.values())


def kmv_sketch(values, k: int = 256) -> list[str]:
    hs = {hashlib.md5(f"kmv:{v}".encode()).hexdigest() for v in values}
    return sorted(hs)[:k]


def hist_bin(x: float, lo: float, hi: float, n_bins: int) -> int:
    width = (hi - lo) / n_bins
    import math

    return min(max(int(math.floor((x - lo) / width)), 0), n_bins - 1)


ids = st.lists(st.integers(0, 10**9), min_size=1, max_size=300)


# --- HLL ---------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(ids)
def test_hll_rank_register_ranges(vs):
    for v in vs:
        r, k = hll_register_rank(v)
        assert 0 <= r < 256 and 1 <= k <= 60


@settings(max_examples=200, deadline=None)
@given(ids, ids)
def test_hll_merge_is_sketch_of_union(a, b):
    merged = {
        r: max(hll_registers(a).get(r, 0), hll_registers(b).get(r, 0))
        for r in set(hll_registers(a)) | set(hll_registers(b))
    }
    assert merged == hll_registers(a + b)


@settings(max_examples=100, deadline=None)
@given(ids, st.integers(0, 10**9))
def test_hll_estimate_monotone_under_insert(vs, extra):
    before = hll_denom(hll_registers(vs))
    after = hll_denom(hll_registers(vs + [extra]))
    # adding a value can only raise a register (or leave it) → denom falls
    # (or holds) → raw estimate rises (or holds)
    assert after <= before


@settings(max_examples=100, deadline=None)
@given(ids)
def test_hll_duplicates_are_free(vs):
    assert hll_registers(vs) == hll_registers(vs + vs)


# --- KMV ---------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(ids, ids)
def test_kmv_merge_is_sketch_of_union(a, b):
    merged = sorted(set(kmv_sketch(a)) | set(kmv_sketch(b)))[:256]
    assert merged == kmv_sketch(a + b)


@settings(max_examples=100, deadline=None)
@given(ids)
def test_kmv_small_sets_are_exact(vs):
    distinct = len(set(vs))
    sk = kmv_sketch(vs)
    if distinct <= 256:
        assert len(sk) == distinct  # the sketch IS the (hashed) set


# --- histogram ---------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=300,
    )
)
def test_hist_bins_partition_everything(xs):
    bins = [hist_bin(x, 0.0, 640.0, 128) for x in xs]
    assert all(0 <= b < 128 for b in bins)
    assert len(bins) == len(xs)  # clamping never drops a value


@settings(max_examples=100, deadline=None)
@given(st.floats(0.0, 639.999, allow_nan=False))
def test_hist_bin_matches_width_arithmetic(x):
    width = 640.0 / 128
    b = hist_bin(x, 0.0, 640.0, 128)
    assert b * width <= x < (b + 1) * width or b in (0, 127)
