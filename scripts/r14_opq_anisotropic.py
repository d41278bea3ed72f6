#!/usr/bin/env python3
"""Round-14 OPQ gate follow-up (r13 verdict item 9): does the learned
rotation's MSE win convert to recall on an ANISOTROPIC corpus?

The r13 gate ran on the synthetic sf embeddings, which are near-
isotropic/axis-aligned — the one regime where OPQ provably cannot help
(contiguous-dim subspaces are already near-optimal); reconstruction
MSE fell monotonically but recall@5 did not beat unrotated 0.250. This
script builds the PINNED anisotropic fixture the gate was missing:

    X' = (X ⊙ s) Qᵀ,  s_i = DECAY^i (geometric variance spectrum),
    Q = QR(gaussian(seed=20260816)) fixed orthogonal mixing

— per-dim variance now decays ~(DECAY²)^i along LATENT axes that are
smeared across all coordinate dims, so contiguous-dim PQ slices cut
across the principal axes and a learned rotation has real structure to
recover. The anisotropy is pinned by construction (seed + decay) and
verified at runtime (variance ratio of the fixture's leading/trailing
principal components). Protocol is r13's exactly: recall@5 of PQ
asymmetric ranking vs exact-L2 ground truth on the FIXTURE vectors,
query panel vec_ids 100-131, unrotated trained K=64 vs learned OPQ at
1/2/3 alternating rounds.

Gate: if OPQ beats unrotated here, the MSE→recall conversion is
demonstrated in the regime the operator documents, and the r13
NO-ACTION (isotropic registered corpus) stands with evidence on both
sides; if it does not, opq_train's claim needs re-examination.

Run: PYTHONPATH=. python3 scripts/r14_opq_anisotropic.py [SF_DIR]
"""

from __future__ import annotations

import importlib.util
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oil_wells_data_wrangling_spark.operators.similarity import (  # noqa: E402
    _OPQ_SCALE,
    _opq_rotate,
    opq_train,
    pq_train_codebook,
)
from oil_wells_data_wrangling_spark.session import get_spark  # noqa: E402
from oil_wells_data_wrangling_spark.sources.readers import (  # noqa: E402
    load_tables,
)

SEED = 20260816
DECAY = 0.88


def _r13():
    spec = importlib.util.spec_from_file_location(
        "r13_opq_recall",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "r13_opq_recall.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def make_anisotropic(X: np.ndarray) -> np.ndarray:
    d = X.shape[1]
    rng = np.random.default_rng(SEED)
    Q, _ = np.linalg.qr(rng.standard_normal((d, d)))
    s = DECAY ** np.arange(d)
    return (X * s) @ Q.T


def anisotropy_report(X: np.ndarray) -> tuple[float, float]:
    """(leading/trailing PC variance ratio, top-8 variance share)."""
    Xc = X - X.mean(axis=0)
    ev = np.linalg.eigvalsh(np.cov(Xc, rowvar=False))[::-1]
    return float(ev[0] / max(ev[-1], 1e-12)), float(ev[:8].sum() / ev.sum())


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    r13 = _r13()
    spark = get_spark(app_name="r14_opq_aniso")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_tables(spark, sf_dir).embeddings.select(
        "vec_id", "embedding"
    )
    ids, X = r13.collect_matrix(emb)

    ratio0, share0 = anisotropy_report(X)
    Xa = make_anisotropic(X)
    ratio1, share1 = anisotropy_report(Xa)
    print(f"original  PC var ratio {ratio0:9.1f}  top-8 share {share0:.3f}")
    print(f"fixture   PC var ratio {ratio1:9.1f}  top-8 share {share1:.3f}")
    assert ratio1 > 10 * ratio0, "fixture failed to add anisotropy"

    emb_a = spark.createDataFrame(
        [(int(i), [float(v) for v in row]) for i, row in zip(ids, Xa)],
        "vec_id long, embedding array<float>",
    ).localCheckpoint(eager=True)
    # float32 storage is the engine's embedding dtype; ground truth
    # uses the same stored values so both legs see identical bytes
    ids_a, Xa32 = r13.collect_matrix(emb_a)
    assert (ids_a == ids).all()

    cb64 = pq_train_codebook(spark, sf_dir, k=64, emb=emb_a).localCheckpoint(
        eager=True
    )
    base = r13.recall_at5(spark, ids, Xa32, emb_a, cb64)
    print(f"anisotropic, trained K=64 unrotated: {base:.4f}", flush=True)

    for iters in (1, 2, 3):
        r_int, cb = opq_train(spark, sf_dir, k=64, iters=iters, emb=emb_a)
        rot = _opq_rotate(spark, emb_a, r_int).localCheckpoint(eager=True)
        rec = r13.recall_at5(spark, ids, Xa32, rot, cb)
        R = r_int.astype(np.float64) / _OPQ_SCALE
        ortho = float(np.abs(R.T @ R - np.eye(R.shape[0])).max())
        print(
            f"anisotropic, trained OPQ K=64 iters={iters}: {rec:.4f}"
            f"  (|R'R-I|max={ortho:.2e})",
            flush=True,
        )


if __name__ == "__main__":
    main()
