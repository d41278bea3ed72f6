"""Connected-components convergence guarantees (dedup_clusters' core).

The pointer-halving scheme must converge in O(log diameter) rounds —
a deep path graph is the adversarial topology where plain min-label
propagation would need O(diameter) rounds and blow the round budget.
"""

from __future__ import annotations

from oil_wells_data_wrangling_spark.operators.dedup import connected_components


def test_deep_chain_converges_in_log_rounds(spark):
    # path graph 0-1-2-...-199: diameter 199. Plain propagation needs
    # ~199 rounds; halving must land well inside the 50-round budget.
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(199)], "src long, dst long"
    )
    before = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    labels, rounds = connected_components(edges)
    got = {r["node"]: r["lbl"] for r in labels.collect()}
    assert got == {i: 0 for i in range(200)}
    assert rounds <= 14, f"expected O(log diameter) rounds, used {rounds}"

    # Storage hygiene: superseded per-round checkpoints must be freed as
    # the loop advances, not accumulate one (cand, labels) pair per
    # round until GC. Relative to the session's pre-existing storage,
    # only the returned labels frame (plus at most a stray in-flight
    # block) may remain persisted.
    after = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    assert after - before <= 2, (
        f"{after - before} new persisted RDDs after {rounds} rounds — "
        "superseded checkpoints are leaking"
    )


def test_multiple_components_and_min_labels(spark):
    edges = spark.createDataFrame(
        # component A: chain 10-11-12-13; component B: triangle 20-21-22
        # with edges listed in arbitrary direction; component C: pair
        [(11, 10), (11, 12), (13, 12), (20, 21), (22, 21), (20, 22), (31, 30)],
        "src long, dst long",
    )
    labels, _ = connected_components(edges)
    got = {r["node"]: r["lbl"] for r in labels.collect()}
    assert got == {
        10: 10, 11: 10, 12: 10, 13: 10,
        20: 20, 21: 20, 22: 20,
        30: 30, 31: 30,
    }


def test_large_random_graph_matches_union_find_oracle(spark):
    """Adversarial-scale case (r6 verdict #6): ~10^5 edges mixing one
    giant random component, long chains (the worst-case diameter
    topology), and a sea of 2-node components. Labels must equal a
    local union-find oracle exactly, and rounds must stay within
    ceil(log2(diameter)) + c — the budget that makes the operator
    viable at 100 TB, where a linear-in-diameter scheme would not be.
    """
    import math

    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(42)
    srcs: list[np.ndarray] = []
    dsts: list[np.ndarray] = []

    # giant component: random spanning structure (parent < i guarantees
    # connectivity) over 60k nodes + 20k extra random intra-edges
    n_giant = 60_000
    parents = (rng.random(n_giant - 1) * np.arange(1, n_giant)).astype(np.int64)
    srcs.append(np.arange(1, n_giant, dtype=np.int64))
    dsts.append(parents)
    extra = rng.integers(0, n_giant, size=(20_000, 2), dtype=np.int64)
    srcs.append(extra[:, 0])
    dsts.append(extra[:, 1])

    # 10 chains of 1000 nodes: diameter 999 dominates the graph, so the
    # round bound is exercised by a topology where min-label
    # propagation would need ~999 rounds
    chain_diameter = 999
    for c in range(10):
        base = 1_000_000 + 2_000 * c
        nodes = np.arange(base, base + 1_000, dtype=np.int64)
        srcs.append(nodes[:-1])
        dsts.append(nodes[1:])

    # 10,011 two-node components (arbitrary edge direction)
    pair_base = 2_000_000
    pairs = np.arange(10_011, dtype=np.int64) * 2 + pair_base
    srcs.append(pairs + 1)
    dsts.append(pairs)

    src = np.concatenate(srcs)
    dst = np.concatenate(dsts)
    assert len(src) >= 100_000

    edges = spark.createDataFrame(
        pd.DataFrame({"src": src, "dst": dst})
    ).repartition(8)
    labels, rounds = connected_components(edges)
    got = {r["node"]: r["lbl"] for r in labels.collect()}

    # local union-find oracle over the identical edge list
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(src.tolist(), dst.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-label semantics: every node's label is the min node id in its
    # component (union by min above keeps roots minimal)
    want = {x: find(x) for x in parent}
    assert got == want
    n_components = len({find(x) for x in parent})
    assert n_components == 1 + 10 + 10_011  # giant + chains + pairs

    budget = math.ceil(math.log2(chain_diameter)) + 4
    assert rounds <= budget, (
        f"{rounds} rounds on diameter-{chain_diameter} graph; "
        f"halving budget is {budget}"
    )
