"""Real-artifact inference: load trained weights from disk, score
distributed, match a local numpy replay bit-for-bit (float64 dot
products are deterministic given identical operand order, and both
sides compute the same np ops over the same feature matrix)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from oil_wells_data_wrangling_spark.operators.inference import (
    NumpyLinearModel,
    NumpyMLPModel,
    featurize,
    load_model,
    score_documents_with_model,
)
from oil_wells_data_wrangling_spark.sources.readers import load_tables


def _feature_matrix(spark, sf_dir) -> pd.DataFrame:
    docs = load_tables(spark, sf_dir).documents
    return featurize(docs).toPandas().sort_values("doc_id").reset_index(drop=True)


def test_npz_linear_artifact_scores_distributed(spark, sf_dir, tmp_path):
    path = str(tmp_path / "probe.npz")
    np.savez(path, w=np.array([0.5, -0.25, 1.5]), b=np.array(3.0))
    model = load_model(path)
    assert isinstance(model, NumpyLinearModel)

    got = (
        score_documents_with_model(
            load_tables(spark, sf_dir).documents, model, cutoff=10.0
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    feats = _feature_matrix(spark, sf_dir)
    x = feats[["n_words", "distinct_permille", "stop_permille"]].to_numpy(
        dtype=np.float64
    )
    want_score = x @ np.array([0.5, -0.25, 1.5]) + 3.0
    assert len(got) == len(feats) > 0
    assert (got["doc_id"].to_numpy() == feats["doc_id"].to_numpy()).all()
    assert (got["score"].to_numpy() == want_score).all()
    assert (got["kept"].to_numpy() == (want_score >= 10.0)).all()
    assert 0 < got["kept"].sum() < len(got)  # cutoff actually separates


def test_npz_mlp_artifact_scores_distributed(spark, sf_dir, tmp_path):
    rng = np.random.default_rng(7)
    w1 = rng.normal(size=(3, 8))
    b1 = rng.normal(size=8)
    w2 = rng.normal(size=8)
    b2 = np.array(0.25)
    path = str(tmp_path / "mlp.npz")
    np.savez(path, w1=w1, b1=b1, w2=w2, b2=b2)
    model = load_model(path)
    assert isinstance(model, NumpyMLPModel)

    got = (
        score_documents_with_model(
            load_tables(spark, sf_dir).documents, model, cutoff=0.0
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    feats = _feature_matrix(spark, sf_dir)
    x = feats[["n_words", "distinct_permille", "stop_permille"]].to_numpy(
        dtype=np.float64
    )
    want = np.maximum(x @ w1 + b1, 0.0) @ w2 + float(b2)
    assert (got["score"].to_numpy() == want).all()


def test_onnx_gate_refuses_cleanly_without_runtime(tmp_path):
    """On hosts without onnxruntime, .onnx artifacts must fail at LOAD
    time with an actionable ImportError — not inside an executor."""
    pytest.importorskip_absent = None  # documentation: no skip here
    try:
        import onnxruntime  # noqa: F401

        has_ort = True
    except ImportError:
        has_ort = False
    p = tmp_path / "m.onnx"
    p.write_bytes(b"\x08\x01")  # placeholder bytes; load gate fires first
    if has_ort:
        m = load_model(str(p))
        assert m.path == str(p)  # session is lazy; creation not attempted
    else:
        with pytest.raises(ImportError, match="onnxruntime"):
            load_model(str(p))


def test_unknown_artifact_extension_rejected(tmp_path):
    p = tmp_path / "m.pkl"
    p.write_bytes(b"")
    with pytest.raises(ValueError, match="unsupported model artifact"):
        load_model(str(p))
