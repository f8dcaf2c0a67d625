"""Write-time validation — schema/predicate checks with strict and
quarantine modes.

Reference parity: Validator / JSONSchemaValidator
(reference:src/maggma/core/validator.py:12-38,
reference:src/maggma/validators.py:13-90; enforcement on write at
reference:src/maggma/stores/mongolike.py:379-387 — strict raises, lenient
logs and drops).

Spark-first formulation: validation is a *partition of the DataFrame*
into (valid, invalid) by a Column predicate — one pass, no Python. Three
rule sources compose:
- required fields (JSON-Schema `required`) -> isNotNull conjunction;
- type checks (JSON-Schema `properties.{f}.type`) -> schema comparison
  at plan time (columnar data has ONE type per column — a type mismatch
  is a plan-time error, not a per-doc one; this is the columnar
  upgrade of per-doc jsonschema);
- arbitrary predicate rules (criteria dicts) for value constraints.

The quarantine path writes invalid rows (with a `_violations` array)
to a side store instead of silently dropping — the lenient-mode upgrade.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructType,
)

from maggma_spark.functions.criteria import compile_criteria

_JSON_TYPE_MAP = {
    "string": (StringType,),
    "integer": (LongType,),
    "number": (DoubleType, LongType),
    "boolean": (BooleanType,),
    "array": (ArrayType,),
    "object": (StructType,),
}


class ValidationError(ValueError):
    pass


class DocumentValidator:
    """Composable validator: JSON-Schema subset + criteria rules."""

    def __init__(
        self,
        schema: Optional[dict] = None,
        rules: Optional[dict[str, dict]] = None,
        strict: bool = False,
    ):
        self.schema = schema or {}
        self.rules = rules or {}
        self.strict = strict

    # -- plan-time (columnar) type validation ---------------------------
    def check_types(self, df: DataFrame) -> list[str]:
        problems = []
        props = self.schema.get("properties", {})
        fields = {f.name: f.dataType for f in df.schema.fields}
        for fname, spec in props.items():
            want = spec.get("type")
            if want is None or fname not in fields:
                continue
            allowed = _JSON_TYPE_MAP.get(want)
            if allowed and not isinstance(fields[fname], allowed):
                problems.append(
                    f"{fname}: expected JSON type {want!r}, column is "
                    f"{fields[fname].simpleString()}")
        return problems

    # -- row-level predicate --------------------------------------------
    def violation_checks(self, df: DataFrame) -> list[tuple[str, Column]]:
        checks: list[tuple[str, Column]] = []
        cols = set(df.columns)
        for req in self.schema.get("required", []):
            pred = F.col(req).isNotNull() if req in cols else F.lit(False)
            checks.append((f"required:{req}", pred))
        for label, crit in self.rules.items():
            checks.append((f"rule:{label}",
                           compile_criteria(crit, schema=df.schema)))
        return checks

    def partition(self, df: DataFrame) -> tuple[DataFrame, DataFrame]:
        """(valid, invalid-with-_violations) in one declarative pass."""
        checks = self.violation_checks(df)
        if not checks:
            return df, df.limit(0).withColumn(
                "_violations", F.array().cast("array<string>"))
        viol = F.array_compact(F.array(*[
            F.when(~F.coalesce(pred, F.lit(False)), F.lit(label))
            for label, pred in checks
        ]))
        tagged = df.withColumn("_violations", viol)
        valid = tagged.filter(F.size("_violations") == 0).drop("_violations")
        invalid = tagged.filter(F.size("_violations") > 0)
        return valid, invalid

    def validate_for_write(
        self, df: DataFrame, quarantine=None
    ) -> DataFrame:
        """The write-gate: plan-time type check, then strict raise /
        quarantine / drop of invalid rows."""
        type_problems = self.check_types(df)
        if type_problems:
            raise ValidationError("; ".join(type_problems))
        valid, invalid = self.partition(df)
        if self.strict:
            bad = invalid.limit(1).collect()
            if bad:
                raise ValidationError(
                    f"strict validation failed, e.g. {bad[0].asDict()}")
            return valid
        if quarantine is not None:
            quarantine.update(invalid, key=getattr(quarantine, "key", None))
        return valid


def check_expectations(df: DataFrame, rules: dict) -> DataFrame:
    """Table-level data-quality expectations: each rule is a Mongo-style
    criteria dict (the same dialect Store.query compiles) that every
    row SHOULD satisfy; returns one row per rule with
    (rule, n_checked, n_violations, violation_rate).

    Composition: rules go through the engine's criteria compiler, so
    the full operator dialect ($in/$gte/$regex/$exists/dotted paths/...)
    is available for expectations, with Mongo null semantics (a row
    missing the field FAILS a value expectation, as it would fail the
    query filter).

    Plan shape: every rule folds to `sum(CASE WHEN NOT pred)` inside
    ONE aggregate over ONE scan (like profile_table) — adding rules
    adds expressions, not passes; the unpivot runs on a single row.
    """
    if not rules:
        raise ValueError("no rules given")
    # internal aliases are index-based and rule names travel as string
    # LITERALS — never interpolated into SQL text — so a rule named
    # "it's `weird`" can neither break parsing nor inject expressions
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, criteria in enumerate(rules.values()):
        pred = compile_criteria(criteria, schema=df.schema)
        aggs.append(
            F.sum(F.when(pred, F.lit(0)).otherwise(F.lit(1)))
            .cast("long").alias(f"__v_{i}"))
    wide = df.agg(*aggs)
    unpivoted = F.explode(F.array(*[
        F.struct(F.lit(name).alias("rule"),
                 F.col(f"__v_{i}").alias("n_violations"))
        for i, name in enumerate(rules)])).alias("__r")
    return (
        wide.select(F.col("__n").alias("n_checked"), unpivoted)
        .select("__r.rule", "n_checked", "__r.n_violations",
                F.round(F.col("__r.n_violations") / F.col("n_checked"), 6)
                .alias("violation_rate"))
    )
