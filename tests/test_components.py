"""connected_components: hash-min label propagation fixpoint."""

from pyspark.sql import functions as F

from duckdb_nats_jetstream_spark.operators.components import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    rows = connected_components(df).collect()
    return {r.doc_id: r.component for r in rows}


def test_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_chain_needs_multiple_rounds(spark):
    # path graph 1-2-3-4-5-6: diameter 5, exercises the iteration loop
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)])
    assert got == {i: 1 for i in range(1, 7)}


def test_multi_edges_and_order_invariance(spark):
    got = _cc(spark, [(5, 9), (9, 5), (5, 9), (2, 9)])
    assert got == {2: 2, 5: 2, 9: 2}


def test_min_id_not_on_every_edge(spark):
    # canonical id 0 enters via one leaf edge only; must still reach 7
    got = _cc(spark, [(3, 7), (7, 12), (0, 12)])
    assert got == {0: 0, 3: 0, 7: 0, 12: 0}


def test_adversarial_chain_converges_within_log_budget(spark):
    """Pathological graph for plain hash-min: one long path (diameter =
    n-1), where min-label propagation alone needs n rounds. Pointer
    doubling must close a 3000-vertex chain within a 16-iteration budget
    (≈ log2(3000) + slack), with the minimum entering at the FAR end."""
    n = 3000
    edges = [(i, i + 1) for i in range(1, n)]  # 1-2-...-3000
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    rows = connected_components(df, max_iter=16, edges_unique=True).collect()
    assert len(rows) == n
    assert all(r.component == 1 for r in rows)


def test_star_and_clique_mixture(spark):
    """Star into a clique into a chain — mixed-shape sanity at a few
    thousand vertices."""
    star = [(100, i) for i in range(101, 600)]
    clique = [(i, j) for i in range(600, 620) for j in range(i + 1, 620)]
    bridge = [(599, 600), (1, 100)]
    chain = [(i, i + 1) for i in range(620, 900)]
    bridge2 = [(619, 620)]
    got = _cc(spark, star + clique + bridge + chain + bridge2)
    assert set(got.values()) == {1}


def test_skew_safe_and_on_round_parity(spark):
    """`skew_safe=True` must be a pure plan-shape change (bit-identical
    labels), and `on_round` must report the measured round count: a
    63-vertex chain needs ~log2(63)+1 doubling rounds, so the callback
    fires more than twice and at most the 16-round budget."""
    edges = [(i, i + 1) for i in range(1, 63)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    rounds = []
    plain = connected_components(df, max_iter=16, edges_unique=True)
    safe = connected_components(
        df, max_iter=16, edges_unique=True, skew_safe=True,
        on_round=rounds.append,
    )
    assert plain.exceptAll(safe).isEmpty() and safe.exceptAll(plain).isEmpty()
    assert rounds == list(range(1, len(rounds) + 1))
    assert 2 < len(rounds) <= 16


def test_random_graphs_match_union_find(spark):
    """Seeded random graphs vs a pure-Python union-find reference: the
    min-label fixpoint must match exact transitive closure on shapes no
    hand-written case covers (self-loops, duplicate edges, many mid-size
    components, a few long tendrils)."""
    import random

    def union_find_labels(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # canonical min id per component
        comp_min = {}
        for v in list(parent):
            r = find(v)
            comp_min[r] = min(comp_min.get(r, v), v)
        return {v: comp_min[find(v)] for v in parent}

    for seed in (7, 23, 1009):
        rng = random.Random(seed)
        n = 400
        edges = [
            (rng.randrange(n), rng.randrange(n))  # self-loops + dups ok
            for _ in range(rng.randrange(150, 500))
        ]
        got = _cc(spark, edges)
        assert got == union_find_labels(edges), f"seed {seed}"
