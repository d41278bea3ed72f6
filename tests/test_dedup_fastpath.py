"""Bit-equality of the Arrow MinHash signature twin against its SQL
expression spec (``minhash_signature`` vs ``minhash_signature_sql``).

All arithmetic is integer (md5 shingle hash, affine permutation mod a
Mersenne prime, array_min), so the contract is EXACT equality of every
signature slot — not a tolerance. The downstream consumers (band
buckets, jaccard estimate, band sensitivity, persisted index) inherit
correctness from this pin plus their own oracle rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oil_wells_data_wrangling_spark.operators.dedup import (
    _docs_with_dups,
    lsh_band_buckets,
    minhash_signature,
    minhash_signature_sql,
)


def _sig_map(df):
    return {
        int(r["doc_id"]): tuple(r["sig"])
        for r in df.toPandas().to_dict("records")
    }


def test_minhash_signature_arrow_matches_sql_spec(spark, sf_dir):
    """Full corpus (with the synthetic near-dup tail rows the dedup
    queries add): every doc present in both, every 32-slot signature
    identical."""
    docs = _docs_with_dups(spark, sf_dir, every=10, tail=" near dup tail marker")
    fast = _sig_map(minhash_signature(docs))
    spec = _sig_map(minhash_signature_sql(docs))
    assert len(fast) == len(spec) > 0
    assert fast == spec


def test_minhash_signature_arrow_matches_sql_spec_adversarial(spark):
    """Adversarial text shapes: sub-3-word docs (filtered by BOTH
    paths), exactly-3-word docs (one shingle), empty words from
    consecutive/leading/trailing spaces, all-space docs, repeated
    words, unicode, and exact duplicates (exercising the factorize
    dedup and the cross-batch cache)."""
    texts = [
        "a b c",                                # exactly one shingle
        "a b",                                  # too short: filtered
        "",                                     # empty: filtered
        "    ",                                 # 5 empty words: 3 shingles
        "a  b c d",                             # double space -> empty word
        " a b c ",                              # leading/trailing space
        "x x x x x x",                          # repeated word
        "héllo wörld ünïcode ø æ ß µ 漢字 かな",  # non-ascii
        ("w1 w2 " * 30).strip(),                # longer doc
        ("w1 w2 " * 30).strip(),                # exact dup of previous
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    ).repartition(3)
    fast = _sig_map(minhash_signature(docs))
    spec = _sig_map(minhash_signature_sql(docs))
    assert fast == spec
    assert 1 not in fast and 2 not in fast  # too short on both paths
    assert 3 in fast                        # all-space doc has shingles
    assert fast[8] == fast[9]               # exact dups agree slot-wise


def test_band_buckets_identical_through_fast_path(spark, sf_dir):
    """The banded exchange keys — the only thing that shuffles at
    100 TB — must be byte-identical through either signature path."""
    docs = _docs_with_dups(spark, sf_dir, every=20, tail="").filter(
        F.col("doc_id") % 3 == 0
    )
    key = lambda df: sorted(  # noqa: E731
        map(tuple, df.toPandas()[["doc_id", "band_id", "bh"]].to_numpy())
    )
    fast = key(lsh_band_buckets(minhash_signature(docs)))
    spec = key(lsh_band_buckets(minhash_signature_sql(docs)))
    assert fast == spec and len(fast) > 0
