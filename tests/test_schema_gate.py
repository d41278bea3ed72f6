"""schema_gate — write-boundary classification of schema drift (r15
§2.E): adds/widens/relaxes pass the additive policy, drops/narrows/
retypes/tightens raise loudly with every violation named, nested
struct/array/map changes classify at the leaf path."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    ArrayType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from oil_wells_data_wrangling_spark.sources.schema_gate import (
    SchemaEvolutionError,
    check_evolution,
    schema_diff,
)


def _s(*fields):
    return StructType([StructField(n, t, nullable=nl) for n, t, nl in fields])


BASE = _s(
    ("id", LongType(), False),
    ("name", StringType(), True),
    ("score", FloatType(), True),
)


def _by_path(diff):
    return {d["path"]: d["change"] for d in diff}


def test_identical_schemas_diff_empty():
    assert schema_diff(BASE, BASE) == []


def test_each_change_classifies():
    new = _s(
        ("id", LongType(), True),          # tightened? no: relaxed
        ("name", IntegerType(), True),     # retyped
        ("score", DoubleType(), True),     # widened
        ("lang", StringType(), True),      # added
        ("n", LongType(), False),          # added_required
    )
    got = _by_path(schema_diff(BASE, new))
    assert got == {
        "id": "relaxed",
        "name": "retyped",
        "score": "widened",
        "lang": "added",
        "n": "added_required",
    }
    # and the reverse direction flips the classes
    rev = _by_path(schema_diff(new, BASE))
    assert rev["id"] == "tightened"
    assert rev["score"] == "narrowed"
    assert rev["lang"] == "removed" and rev["n"] == "removed"


def test_decimal_widening_rules():
    old = _s(("v", DecimalType(10, 2), True))
    assert _by_path(
        schema_diff(old, _s(("v", DecimalType(12, 2), True)))
    ) == {"v": "widened"}  # more integer headroom
    assert _by_path(
        schema_diff(old, _s(("v", DecimalType(12, 4), True)))
    ) == {"v": "widened"}  # headroom kept, scale grew
    assert _by_path(
        schema_diff(old, _s(("v", DecimalType(10, 4), True)))
    ) == {"v": "narrowed"}  # scale grew by EATING headroom (8 -> 6)
    assert _by_path(
        schema_diff(old, _s(("v", DecimalType(10, 1), True)))
    ) == {"v": "narrowed"}  # fraction digits lost


def test_nested_paths_classify_at_leaf():
    old = _s(
        (
            "props",
            StructType(
                [
                    StructField("tag", StringType(), True),
                    StructField("ids", ArrayType(IntegerType()), True),
                ]
            ),
            True,
        ),
    )
    new = _s(
        (
            "props",
            StructType(
                [
                    StructField("tag", StringType(), True),
                    StructField("ids", ArrayType(LongType()), True),
                    StructField("extra", StringType(), True),
                ]
            ),
            True,
        ),
    )
    got = _by_path(schema_diff(old, new))
    assert got == {"props.ids[]": "widened", "props.extra": "added"}


def test_policies(spark):
    base_df = spark.createDataFrame([], BASE)
    additive_df = spark.createDataFrame(
        [], _s(*[(f.name, f.dataType, f.nullable) for f in BASE.fields],
               ("lang", StringType(), True))
    )
    breaking_df = spark.createDataFrame(
        [], _s(("id", LongType(), False), ("name", StringType(), True))
    )  # score removed
    # additive passes additive, fails strict
    diff = check_evolution(additive_df, BASE, policy="additive")
    assert _by_path(diff) == {"lang": "added"}
    with pytest.raises(SchemaEvolutionError):
        check_evolution(additive_df, BASE, policy="strict")
    # breaking fails additive, passes any (returned, not raised)
    with pytest.raises(SchemaEvolutionError) as ei:
        check_evolution(breaking_df, BASE, policy="additive")
    assert [v["path"] for v in ei.value.violations] == ["score"]
    assert _by_path(check_evolution(breaking_df, BASE, policy="any")) == {
        "score": "removed"
    }
    # no drift passes strict
    assert check_evolution(base_df, BASE, policy="strict") == []


def test_gate_against_parquet_table(spark, tmp_path):
    """The deployment shape: gate an append against the table's own
    footer schema, then land it with mergeSchema."""
    path = str(tmp_path / "t")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(
        path
    )
    widened = spark.createDataFrame(
        [(2, "b", "en")], "id long, name string, lang string"
    )
    diff = check_evolution(widened, path, policy="additive")
    assert _by_path(diff) == {"lang": "added"}
    widened.write.mode("append").parquet(path)
    back = spark.read.option("mergeSchema", "true").parquet(path)
    assert back.count() == 2 and "lang" in back.columns
    # a drop is refused before it ever lands
    dropped = spark.createDataFrame([(3,)], "id long")
    with pytest.raises(SchemaEvolutionError):
        check_evolution(dropped, path, policy="additive")
