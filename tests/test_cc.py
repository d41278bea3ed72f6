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
