#!/usr/bin/env python3
"""Round-11 PQ recall table (BASELINE.md evidence).

    python scripts/r11_pq_recall.py SF_DIR

Recall@5 of full-scan PQ asymmetric-distance ranking vs exact
squared-L2 (the ivf_pq_search query panel, vec_ids 100-131) for:
  - the first-16-vectors stand-in,
  - trained K=16 / K=64 / K=256 codebooks (2 Lloyd steps each),
  - trained K=64 over RANDOM-ROTATED inputs (OPQ's "RR" baseline:
    an md5-seeded signed permutation — orthogonal, so exact L2
    ranks are unchanged and recall stays comparable).
The K table answers "does production K pay off on this data"; the
rotation row answers the r10 verdict's OPQ decision item.
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from oil_wells_data_wrangling_spark.operators.similarity import (
    _DIM,
    _PQ_DSUB,
    _PQ_M,
    pq_encode,
    pq_standin_codebook,
    pq_train_codebook,
)
from oil_wells_data_wrangling_spark.session import get_spark
from oil_wells_data_wrangling_spark.sources.readers import load_tables


def signed_permutation(dim: int, seed: str = "opq_rr_v1"):
    """Deterministic orthogonal transform: md5-ranked permutation of
    dims + md5-derived sign per dim (a signed permutation matrix)."""
    ranks = sorted(
        range(dim),
        key=lambda i: hashlib.md5(f"{seed}_p_{i}".encode()).hexdigest(),
    )
    signs = [
        1 if int(hashlib.md5(f"{seed}_s_{i}".encode()).hexdigest()[:2], 16) % 2
        else -1
        for i in range(dim)
    ]
    return ranks, signs


def rotate_expr(perm, signs) -> str:
    idxs = ", ".join(str(p) for p in perm)
    sgns = ", ".join(f"{s}.0D" for s in signs)
    return (
        f"zip_with(array({idxs}), array({sgns}),"
        " (p, s) -> cast(element_at(embedding, p + 1) as double) * s)"
    )


def recall_at5(spark, sf_dir, cb_df, emb_df) -> float:
    rows = emb_df.collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    ids, X = ids[order], X[order]

    cb = {
        (r.sub, r.code): np.array(r.cd, dtype=np.float64)
        for r in cb_df.collect()
    }
    codes: dict[int, dict[int, int]] = {}
    for r in pq_encode(emb_df, cb_df).collect():
        codes.setdefault(r.vec_id, {})[r.sub] = r.code

    q_ids = [int(i) for i in ids if 100 <= i <= 131]
    hits = total = 0
    for q in q_ids:
        qv = X[ids == q][0]
        d = ((X - qv) ** 2).sum(axis=1)
        d[ids == q] = np.inf
        gt = set(ids[np.argsort(d)[:5]].tolist())
        adist = np.zeros(len(ids))
        for j, vid in enumerate(ids):
            if vid == q:
                adist[j] = np.inf
                continue
            s = 0.0
            for m in range(_PQ_M):
                c = cb[(m, codes[int(vid)][m])]
                qs = qv[m * _PQ_DSUB : (m + 1) * _PQ_DSUB]
                s += ((qs - c) ** 2).sum()
            adist[j] = s
        got = set(ids[np.argsort(adist)[:5]].tolist())
        hits += len(gt & got)
        total += 5
    return hits / total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="r11_pq_recall")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_tables(spark, sf_dir).embeddings.select("vec_id", "embedding")

    print("standin K=16:", round(
        recall_at5(spark, sf_dir, pq_standin_codebook(spark, sf_dir), emb), 4))
    for k in (16, 64, 256):
        cb = pq_train_codebook(spark, sf_dir, k=k).localCheckpoint(eager=True)
        print(f"trained K={k}:", round(recall_at5(spark, sf_dir, cb, emb), 4),
              flush=True)

    perm, signs = signed_permutation(_DIM)
    rot = emb.select(
        "vec_id", F.expr(rotate_expr(perm, signs)).alias("embedding")
    ).localCheckpoint(eager=True)
    cb_rot = pq_train_codebook(
        spark, sf_dir, k=64, emb=rot
    ).localCheckpoint(eager=True)
    print("trained K=64 + signed-permutation rotation:",
          round(recall_at5(spark, sf_dir, cb_rot, rot), 4))


if __name__ == "__main__":
    main()
