"""Schema-evolution gate — classify a delivery's schema drift BEFORE
it lands, instead of debugging readers after.

The MOR store (sources/sinks.py) merges footers so widened deltas
read back whole; this module is the other half of schema discipline:
a WRITE-time gate that diffs the incoming frame's schema against the
table it extends and classifies every change:

- ``added`` (new nullable field)            → additive, safe
- ``added_required`` (new non-nullable)     → breaking (old rows have
  no value; parquet backfill is NULL, violating the declared contract)
- ``removed``                               → breaking (consumers lose
  a column silently — the classic downstream-pipeline breaker)
- ``widened`` (byte→short→int→long,
  float→double, decimal precision growth
  at equal-or-greater scale headroom)       → compatible
- ``narrowed`` / ``retyped``                → breaking (precision or
  semantics loss)
- ``relaxed`` (required → nullable)         → compatible
- ``tightened`` (nullable → required)       → breaking
- struct/array/map ELEMENT changes recurse and classify at the leaf
  path (``props.tags[].id``-style paths)

``check_evolution`` applies a policy: ``strict`` (no drift at all),
``additive`` (adds/widens/relaxes pass — the sane default for
append-style corpora), ``any`` (log-only). Breaking drift raises
``SchemaEvolutionError`` listing every violation — loud at the write
boundary, where it is one commit to fix, instead of at the Nth
consumer, where it is an incident.

Everything here is driver-side metadata work on StructTypes — no jobs,
no data reads; the one optional IO is reading the target's footer
schema via a zero-row scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    DataType,
    DecimalType,
    MapType,
    StructType,
)

# widening lattice: rank grows with range; a change is WIDENED when
# both types are in one family and rank strictly increases
_NUMERIC_RANK = {
    "byte": 1, "short": 2, "integer": 3, "long": 4,
}
_FLOAT_RANK = {"float": 1, "double": 2}


class SchemaEvolutionError(ValueError):
    """Breaking schema drift at a write boundary; ``.violations``
    holds the classified change dicts."""

    def __init__(self, violations: list[dict]):
        self.violations = violations
        lines = "; ".join(
            f"{v['change']} {v['path']}"
            + (
                f" ({v['from']} -> {v['to']})"
                if v.get("from") or v.get("to")
                else ""
            )
            for v in violations
        )
        super().__init__(f"breaking schema evolution: {lines}")


def _widens(old: DataType, new: DataType) -> bool:
    o, n = old.typeName(), new.typeName()
    if o in _NUMERIC_RANK and n in _NUMERIC_RANK:
        return _NUMERIC_RANK[n] > _NUMERIC_RANK[o]
    if o in _FLOAT_RANK and n in _FLOAT_RANK:
        return _FLOAT_RANK[n] > _FLOAT_RANK[o]
    if isinstance(old, DecimalType) and isinstance(new, DecimalType):
        # scale must not shrink (fraction digits lost) and integer
        # headroom (precision - scale) must not shrink either
        return (
            (new.precision, new.scale) != (old.precision, old.scale)
            and new.scale >= old.scale
            and (new.precision - new.scale) >= (old.precision - old.scale)
        )
    return False


def _diff_type(path: str, old: DataType, new: DataType, out: list[dict]):
    if old.typeName() == new.typeName():
        if isinstance(old, StructType):
            _diff_struct(path, old, new, out)
            return
        if isinstance(old, ArrayType):
            _diff_type(f"{path}[]", old.elementType, new.elementType, out)
            return
        if isinstance(old, MapType):
            _diff_type(f"{path}{{k}}", old.keyType, new.keyType, out)
            _diff_type(f"{path}{{v}}", old.valueType, new.valueType, out)
            return
        if isinstance(old, DecimalType):  # same typeName, maybe resized
            if (old.precision, old.scale) == (new.precision, new.scale):
                return
        else:
            return  # identical scalar
    if _widens(old, new):
        change = "widened"
    elif _widens(new, old) or (
        isinstance(old, DecimalType) and isinstance(new, DecimalType)
    ):
        # a decimal resize that isn't a widen loses SOMETHING —
        # fraction digits or integer headroom — in every direction
        change = "narrowed"
    else:
        change = "retyped"
    out.append(
        {
            "path": path,
            "change": change,
            "from": old.simpleString(),
            "to": new.simpleString(),
        }
    )


def _diff_struct(prefix: str, old: StructType, new: StructType, out: list[dict]):
    oldf = {f.name: f for f in old.fields}
    newf = {f.name: f for f in new.fields}
    for name, f in newf.items():
        path = f"{prefix}.{name}" if prefix else name
        if name not in oldf:
            out.append(
                {
                    "path": path,
                    "change": "added" if f.nullable else "added_required",
                    "from": None,
                    "to": f.dataType.simpleString(),
                }
            )
            continue
        o = oldf[name]
        if o.nullable != f.nullable:
            out.append(
                {
                    "path": path,
                    "change": "relaxed" if f.nullable else "tightened",
                    "from": "required" if not o.nullable else "nullable",
                    "to": "nullable" if f.nullable else "required",
                }
            )
        _diff_type(path, o.dataType, f.dataType, out)
    for name, o in oldf.items():
        if name not in newf:
            out.append(
                {
                    "path": f"{prefix}.{name}" if prefix else name,
                    "change": "removed",
                    "from": o.dataType.simpleString(),
                    "to": None,
                }
            )


def schema_diff(old: StructType, new: StructType) -> list[dict]:
    """Classified field-level diff from ``old`` to ``new`` — one dict
    per change: ``{path, change, from, to}`` with leaf paths into
    structs (``a.b``), arrays (``a[]``) and maps (``a{k}``/``a{v}``).
    Empty list = identical schemas."""
    out: list[dict] = []
    _diff_struct("", old, new, out)
    return out


_COMPATIBLE = {"added", "widened", "relaxed"}


def check_evolution(
    new_df: DataFrame,
    against,
    policy: str = "additive",
    spark: SparkSession | None = None,
) -> list[dict]:
    """Gate ``new_df`` against an existing schema (a StructType, or a
    parquet table path read footer-only). Returns the full classified
    diff; raises ``SchemaEvolutionError`` per ``policy``:
    ``strict`` = any drift raises, ``additive`` = breaking classes
    raise (adds/widens/relaxes pass), ``any`` = never raises."""
    if policy not in ("strict", "additive", "any"):
        raise ValueError(f"unknown policy {policy!r}")
    if isinstance(against, StructType):
        old = against
    else:
        s = spark or new_df.sparkSession
        old = s.read.parquet(str(against)).schema
    diff = schema_diff(old, new_df.schema)
    if policy == "any" or not diff:
        return diff
    bad = (
        diff
        if policy == "strict"
        else [d for d in diff if d["change"] not in _COMPATIBLE]
    )
    if bad:
        raise SchemaEvolutionError(bad)
    return diff
