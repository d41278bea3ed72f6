#!/usr/bin/env python3
"""Round-13 learned-OPQ recall gate (BASELINE.md evidence).

    python scripts/r13_opq_recall.py [SF_DIR]

Extends the r11 PQ recall table: recall@5 of full-scan PQ
asymmetric-distance ranking vs EXACT squared-L2 over the ORIGINAL
(unrotated) vectors — the ivf_pq_search query panel, vec_ids 100-131 —
for the unrotated trained K=64 codebook (the 0.250 fence) and for
learned-OPQ K=64 at 1/2/3 alternating rounds. The r11 lesson: a
data-blind rotation HURT (0.181); the gate for landing OPQ anywhere
hot is beating unrotated 0.250 at equal index size.

Ground truth always comes from the original vectors; the PQ leg ranks
in whichever space its codebook lives (R is orthogonal to 1e-6, so
the comparison is apples-to-apples).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oil_wells_data_wrangling_spark.operators.similarity import (  # noqa: E402
    _OPQ_SCALE,
    _PQ_DSUB,
    _PQ_M,
    _opq_rotate,
    opq_train,
    pq_encode_arrow,
    pq_train_codebook,
)
from oil_wells_data_wrangling_spark.session import get_spark  # noqa: E402
from oil_wells_data_wrangling_spark.sources.readers import (  # noqa: E402
    load_tables,
)


def collect_matrix(emb_df):
    rows = emb_df.collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], X[order]


def recall_at5(spark, ids, X_orig, emb_space_df, cb_df) -> float:
    """PQ asymmetric recall@5 against exact-L2 ground truth on the
    ORIGINAL vectors. ``emb_space_df`` is the (possibly rotated) frame
    the codebook was trained in; queries are projected into that space
    by reading their rows from it."""
    sids, S = collect_matrix(emb_space_df)
    assert (sids == ids).all()
    cb = {}
    for r in cb_df.collect():
        cb.setdefault(int(r.sub), {})[int(r.code)] = np.array(
            r.cd, dtype=np.float64
        )
    codes = {}
    for r in pq_encode_arrow(spark, emb_space_df, cb_df).collect():
        codes.setdefault(int(r.vec_id), {})[int(r.sub)] = int(r.code)
    # reconstruction matrix in codebook space
    Y = np.empty_like(S)
    for j, vid in enumerate(ids):
        for m in range(_PQ_M):
            Y[j, m * _PQ_DSUB : (m + 1) * _PQ_DSUB] = cb[m][
                codes[int(vid)][m]
            ]
    q_ids = [int(i) for i in ids if 100 <= i <= 131]
    hits = total = 0
    for q in q_ids:
        qi = np.nonzero(ids == q)[0][0]
        d = ((X_orig - X_orig[qi]) ** 2).sum(axis=1)
        d[qi] = np.inf
        gt = set(ids[np.argsort(d)[:5]].tolist())
        ad = ((Y - S[qi]) ** 2).sum(axis=1)  # asymmetric: exact query
        ad[qi] = np.inf
        got = set(ids[np.argsort(ad)[:5]].tolist())
        hits += len(gt & got)
        total += 5
    return hits / total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="r13_opq_recall")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_tables(spark, sf_dir).embeddings.select(
        "vec_id", "embedding"
    ).localCheckpoint(eager=True)
    ids, X = collect_matrix(emb)

    cb64 = pq_train_codebook(spark, sf_dir, k=64, emb=emb).localCheckpoint(
        eager=True
    )
    base = recall_at5(spark, ids, X, emb, cb64)
    print(f"trained K=64 unrotated: {base:.4f}", flush=True)

    for iters in (1, 2, 3):
        r_int, cb = opq_train(spark, sf_dir, k=64, iters=iters, emb=emb)
        rot = _opq_rotate(spark, emb, r_int).localCheckpoint(eager=True)
        rec = recall_at5(spark, ids, X, rot, cb)
        # orthogonality check of the quantized rotation
        R = r_int.astype(np.float64) / _OPQ_SCALE
        ortho = float(np.abs(R.T @ R - np.eye(R.shape[0])).max())
        print(
            f"trained OPQ K=64 iters={iters}: {rec:.4f}"
            f"  (|R'R-I|max={ortho:.2e})",
            flush=True,
        )


if __name__ == "__main__":
    main()
