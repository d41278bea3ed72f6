"""Semantic checks for the round-9 operators. Exact DuckDB parity is
covered by test_oracle_parity.py; these assert the properties each
operator exists to deliver."""

from __future__ import annotations

from pyspark.sql import functions as F


# ------------------------------------------------------------ bpe_train_batched


def test_bpe_batched_learns_16_merges_in_2_roundtrips(spark, sf_dir):
    """The batched trainer must reach 16 merges in 2 driver
    round-trips (the production merge-count shape bpe_train_steps'
    per-merge collect cannot), round 1's batch must equal
    bpe_pair_counts' top-8 census ranks (same ranking, same corpus),
    and round 1's top merge must equal sequential BPE's first merge."""
    from oil_wells_data_wrangling_spark.operators.textstats import (
        _BPEB_K,
        _BPEB_ROUNDS,
        bpe_pair_counts,
        bpe_train_batched,
        bpe_train_steps,
    )

    rows = sorted(
        bpe_train_batched(spark, sf_dir).collect(),
        key=lambda r: (r.rnd, r.ark),
    )
    assert len(rows) == _BPEB_ROUNDS * _BPEB_K == 16
    for rnd in range(1, _BPEB_ROUNDS + 1):
        batch = [r for r in rows if r.rnd == rnd]
        assert [r.ark for r in batch] == list(range(1, _BPEB_K + 1))
        assert [r.n for r in batch] == sorted(
            (r.n for r in batch), reverse=True
        )
    census = sorted(
        bpe_pair_counts(spark, sf_dir).collect(), key=lambda r: r.rank
    )
    for got, want in zip(rows[:_BPEB_K], census[:_BPEB_K]):
        assert (got.a, got.b, got.n) == (want.a, want.b, want.n_pair)
    seq1 = sorted(
        bpe_train_steps(spark, sf_dir).collect(), key=lambda r: r.step
    )[0]
    assert (rows[0].a, rows[0].b, rows[0].n) == (seq1.a, seq1.b, seq1.n)
