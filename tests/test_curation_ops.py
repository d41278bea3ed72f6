"""Semantic + plan-shape checks for the late-round-7 curation operators
(excess_inventory_suppliers, triangle_count, dsir_weights,
boilerplate_lines, k_anonymity_report). Exact-value parity with DuckDB
is covered by test_oracle_parity.py; these assert the PROPERTIES each
operator exists to deliver — thresholds, orientation invariants,
discrimination direction, mass conservation — plus the plan shapes the
scale story depends on."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from oil_wells_data_wrangling_spark.operators.analytics import (
    excess_inventory_suppliers,
)
from oil_wells_data_wrangling_spark.operators.corpus import dsir_weights
from oil_wells_data_wrangling_spark.operators.graph import triangle_count
from oil_wells_data_wrangling_spark.operators.privacy import (
    _KANON_K,
    k_anonymity_report,
)
from oil_wells_data_wrangling_spark.operators.textstats import (
    _BP_MIN_DOCS,
    boilerplate_lines,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ------------------------------------------------------------ triangle_count


def test_triangle_total_matches_bruteforce(spark, sf_dir):
    """Degree-oriented wedge counting must equal the O(n^3) definition
    on the (node-bounded) domain graph: every unordered node triple
    whose three edges all exist, counted once."""
    out = triangle_count(spark, sf_dir).collect()
    total = sum(r.tri_pivot for r in out)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    n = docs.count()
    h32 = (
        "cast(conv(substr(md5(concat('lnk', doc_id)), 1, 8), 16, 10) as bigint)"
        " % 2147483647"
    )
    pairs = (
        docs.select(
            F.col("source").alias("a"),
            (F.expr(h32) % n).alias("t_id"),
        )
        .join(
            docs.select(F.col("doc_id").alias("t_id"), F.col("source").alias("b")),
            "t_id",
        )
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
        .collect()
    )
    edge = {(r.a, r.b) for r in pairs}
    nodes = sorted({x for e in edge for x in e})
    brute = 0
    for i, u in enumerate(nodes):
        for j in range(i + 1, len(nodes)):
            v = nodes[j]
            if (u, v) not in edge:
                continue
            for k in range(j + 1, len(nodes)):
                w = nodes[k]
                if (u, w) in edge and (v, w) in edge:
                    brute += 1
    assert total == brute
    assert total > 0, "test graph has no triangles — property is vacuous"


def test_triangle_plan_has_no_cartesian(spark, sf_dir):
    plan = _plan(triangle_count(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # the corpus-priced edge extraction is persisted so deg/ori/probe
    # reuse one scan (the only BroadcastNestedLoopJoin allowed is the
    # benign 1-row corpus-count crossJoin inside that cached subtree)
    assert "InMemoryTableScan" in plan
    # wedge + closing-edge joins must be hash joins on the cached table
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


# -------------------------------------------------------------- dsir_weights


def test_dsir_separates_target_from_source(spark, sf_dir):
    """The whole point of DSIR: target-language docs must score higher
    on average than source docs (their unigrams sit in buckets where
    the target distribution dominates)."""
    rows = dsir_weights(spark, sf_dir).collect()
    en = [r.dsir_score / r.n_words for r in rows if r.lang == "en"]
    rest = [r.dsir_score / r.n_words for r in rows if r.lang != "en"]
    assert en and rest
    assert sum(en) / len(en) > sum(rest) / len(rest)


def test_dsir_one_corpus_scan(spark, sf_dir):
    """The doc-level histogram serves both the global estimate and the
    per-doc score through a persisted intermediate (the plan reads
    InMemoryTableScan on both branches — one corpus scan at runtime),
    and the 1024-row weight table joins broadcast, never shuffled."""
    plan = _plan(dsir_weights(spark, sf_dir))
    assert "InMemoryTableScan" in plan, plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# --------------------------------------------------------- boilerplate_lines


def test_boilerplate_flags_injected_banner_only_when_frequent(spark, sf_dir):
    """Every source with >= _BP_MIN_DOCS injected docs must have its
    banner flagged in ALL its injected docs; docs without injection
    should be (near-)clean."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    per_source = {
        r.source: r.n
        for r in docs.filter(F.col("doc_id") % 3 == 0)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    out = {r.doc_id: r for r in boilerplate_lines(spark, sf_dir).collect()}
    src_of = {r.doc_id: r.source for r in docs.collect()}
    for doc_id, r in out.items():
        injected = doc_id % 3 == 0
        if injected and per_source[src_of[doc_id]] >= _BP_MIN_DOCS:
            assert r.n_boiler >= 1, f"doc {doc_id}: banner not flagged"
            assert 0 < r.boiler_ppm < 1_000_000
    # the cleaned fingerprint of an injected doc equals the original
    # text's chunking only if the banner chunk was dropped AND nothing
    # else was — spot-check aggregate: flagged mass stays well under
    # half the corpus (boilerplate removal must not eat content)
    total = sum(r.n_chunks for r in out.values())
    boiler = sum(r.n_boiler for r in out.values())
    assert 0 < boiler < total // 2


def test_boilerplate_all_template_doc_fingerprints_null(spark, tmp_path):
    """A doc whose every chunk is boilerplate must get clean_fp = NULL —
    matching the oracle's string_agg-over-all-NULL semantics — never
    md5('') (array_join silently drops NULL elements). Checked by
    running the Spark operator AND the DuckDB oracle on the same
    micro-corpus and comparing bit-for-bit."""
    import duckdb

    from oil_wells_data_wrangling_spark.operators.textstats import (
        _BP_CHUNK,
        _BP_MIN_DOCS,
        _BP_ORACLE,
    )

    template = " ".join(f"w{i}" for i in range(_BP_CHUNK))
    rows = [
        # enough same-source docs sharing the template chunk to flag it;
        # doc_ids avoid %3==0 so the operator's banner injection stays off
        (1 + 3 * i, "s1", template + " unique" + str(i) * 30)
        for i in range(_BP_MIN_DOCS)
    ]
    # the all-template doc: every chunk is the flagged one
    rows.append((1 + 3 * _BP_MIN_DOCS, "s1", template))
    sf = tmp_path / "bp_sf"
    spark.createDataFrame(
        rows, "doc_id bigint, source string, text string"
    ).coalesce(1).write.parquet(str(sf / "documents.parquet"))

    got = {r.doc_id: r for r in boilerplate_lines(spark, str(sf)).collect()}
    all_bp = got[1 + 3 * _BP_MIN_DOCS]
    assert all_bp.n_boiler == all_bp.n_chunks
    assert all_bp.clean_fp is None, (
        f"all-boilerplate doc fingerprinted as {all_bp.clean_fp!r}, not NULL"
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    want = {
        r[0]: r
        for r in con.execute(
            _BP_ORACLE + " ORDER BY doc_id"
        ).fetchall()
    }
    for doc_id, r in got.items():
        assert (r.n_chunks, r.n_boiler, r.boiler_ppm, r.clean_fp) == want[
            doc_id
        ][1:], f"doc {doc_id} diverges from oracle"


# ------------------------------------------------------- k_anonymity_report


def test_kanon_conserves_records_and_respects_k(spark, sf_dir):
    rows = k_anonymity_report(spark, sf_dir).collect()
    n_cust = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert sum(r.n_records for r in rows) == n_cust
    for r in rows:
        if r.level < 3:
            # every surviving class holds >= k records, so classes * k
            # cannot exceed the records assigned to that rung
            assert r.n_groups * _KANON_K <= r.n_records
            assert r.n_groups > 0
        else:
            assert r.n_groups == 0


# ------------------------------------------- excess_inventory_suppliers (Q20)


def test_excess_inventory_threshold_is_strict_majority(spark, sf_dir):
    """Recompute the (supplier, part) quantity split directly and check
    the operator's supplier set is exactly the nation-filtered strict
    majority set — the cross-multiplied threshold did not drift."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    qty = F.round("l_quantity").cast("bigint")
    in96 = F.col("l_shipdate").between("1996-01-01", "1996-12-31 23:59:59")
    sq = (
        li.join(part.filter(F.col("p_name").like("red%")), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(qty).alias("tot"),
            F.sum(F.when(in96, qty).otherwise(F.lit(0))).alias("y"),
        )
        .filter(F.col("y") * 2 > F.col("tot"))
        .select("l_suppkey")
        .distinct()
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name").isin("NATION_3", "NATION_11", "NATION_19"))
        .select("s_name")
        .collect()
    )
    expect = sorted(r.s_name for r in sq)
    got = [r.s_name for r in excess_inventory_suppliers(spark, sf_dir).collect()]
    assert got == expect


def test_excess_inventory_plan_broadcasts_and_single_wide_agg(spark, sf_dir):
    plan = _plan(excess_inventory_suppliers(spark, sf_dir))
    assert "SortMergeJoin" not in plan
    # one wide exchange for the (supplier, part) agg; the rest are
    # broadcast dims and the distinct on the tiny survivor set
    fact_exchanges = len(
        re.findall(r"Exchange hashpartitioning\(l_suppkey", plan)
    )
    assert fact_exchanges >= 1


def test_kanon_bucket_edges_floor_on_any_balance(spark, tmp_path):
    """Balance bucketing must use FLOOR division on both engines: a
    micro customer table with deeply negative balances (outside the
    TPC-H range the old +100000 offset silently assumed) must produce
    identical reports from the Spark operator and the DuckDB oracle."""
    import duckdb

    from oil_wells_data_wrangling_spark.operators.privacy import (
        _KANON_K,
        _KANON_ORACLE,
    )

    rows = []
    ck = 0
    # one k-sized class straddling each side of zero offset-cents,
    # plus balances far below -1000 where truncate != floor
    for bal in (-5432.10, -1500.00, -999.99, -0.01, 0.0, 2500.0):
        for _ in range(_KANON_K):
            ck += 1
            rows.append((ck, 7, "BUILDING", bal))
    # a suppressed singleton at an extreme negative balance
    rows.append((ck + 1, 3, "MACHINERY", -88888.88))
    sf = tmp_path / "kanon_sf"
    spark.createDataFrame(
        rows, "c_custkey bigint, c_nationkey int, c_mktsegment string, "
        "c_acctbal double"
    ).coalesce(1).write.parquet(str(sf / "customer.parquet"))

    got = sorted(
        tuple(r) for r in k_anonymity_report(spark, str(sf)).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{sf}/customer.parquet/*.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(_KANON_ORACLE).fetchall())
    assert got == want, f"engine divergence on negative balances: {got} {want}"
