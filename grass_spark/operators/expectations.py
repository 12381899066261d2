"""Declarative data-contract expectations — the dbt-tests /
Great-Expectations analog: a rule list compiled into ONE scan-stage
aggregate pass that reports violations per rule instead of crashing
(or worse, silently passing) the 100-TB load.

Rule kinds:

* ``not_null``                 — column has no NULLs
* ``unique``                   — no duplicate non-null values
* ``in_set``   (values=[...])  — every non-null value in the set
* ``range``    (lo=, hi=)      — lo <= value <= hi (non-null rows)
* ``regex``    (pattern=)      — non-null values match (RE2-safe
                                 subset: keep to literals/classes/
                                 anchors so Java and RE2 agree)

Scale shape: every rule compiles to a conditional counter inside ONE
``df.agg(...)`` — a single map-side-combinable pass over the table; no
rule adds a scan.  ``unique`` needs an exact distinct (the one
genuinely expensive check — the same count-distinct any engine pays);
everything else is a projection counter.  The per-rule report rows
come from exploding a literal array of structs over the 1-row
aggregate — zero extra jobs.

Cross-engine parity: all counters are exact integers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["expect", "validate"]

_KINDS = ("not_null", "unique", "in_set", "range", "regex")


def expect(name: str, column: str, kind: str, **params) -> dict:
    """Build one expectation rule (validated eagerly)."""
    if kind not in _KINDS:
        raise ValueError(f"expect: unknown kind {kind!r}")
    if kind == "in_set" and not params.get("values"):
        raise ValueError("expect: in_set needs non-empty values=")
    if kind == "range" and (
        "lo" not in params or "hi" not in params
    ):
        raise ValueError("expect: range needs lo= and hi=")
    if kind == "regex" and not params.get("pattern"):
        raise ValueError("expect: regex needs pattern=")
    return {"name": name, "column": column, "kind": kind, **params}


def _violations(rule: dict) -> Column:
    c = F.col(rule["column"])
    kind = rule["kind"]
    if kind == "not_null":
        bad = c.isNull()
    elif kind == "in_set":
        bad = c.isNotNull() & ~c.isin(*rule["values"])
    elif kind == "range":
        bad = c.isNotNull() & (
            (c < F.lit(rule["lo"])) | (c > F.lit(rule["hi"]))
        )
    elif kind == "regex":
        bad = c.isNotNull() & ~c.rlike(rule["pattern"])
    else:  # unique — handled separately (needs distinct, not a CASE)
        raise AssertionError
    return F.sum(bad.cast("long"))


def validate(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Run all ``rules`` in one aggregate pass.  Returns one row per
    rule: ``(rule, column, kind, n_violations, n_rows, passed)``.

    ``unique`` counts the EXTRA copies (``count(col) -
    count_distinct(col)``) so a clean column reports 0.
    """
    if not rules:
        raise ValueError("validate: empty rule list")
    names = [r["name"] for r in rules]
    if len(set(names)) != len(names):
        raise ValueError("validate: duplicate rule names")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, r in enumerate(rules):
        if r["kind"] == "unique":
            aggs.append(
                (
                    F.count(r["column"])
                    - F.count_distinct(F.col(r["column"]))
                ).alias(f"_v{i}")
            )
        else:
            aggs.append(
                F.coalesce(_violations(r), F.lit(0)).alias(f"_v{i}")
            )
    one = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(r["name"]).alias("rule"),
                F.lit(r["column"]).alias("column"),
                F.lit(r["kind"]).alias("kind"),
                F.col(f"_v{i}").cast("long").alias("n_violations"),
            )
            for i, r in enumerate(rules)
        ]
    )
    return (
        one.select(F.col("_n").alias("n_rows"), F.explode(entries).alias("_e"))
        .select(
            F.col("_e.rule").alias("rule"),
            F.col("_e.column").alias("column"),
            F.col("_e.kind").alias("kind"),
            F.col("_e.n_violations").alias("n_violations"),
            "n_rows",
            (F.col("_e.n_violations") == 0).alias("passed"),
        )
    )
