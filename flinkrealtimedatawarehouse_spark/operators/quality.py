"""Table-level data-quality constraints (expectations).

The reference's only quality gate is row-level parse-or-dirty routing
(P1, rt/app/dwd/BaseLogApp.java:46-62): a record either parses or goes to
the dirty side output. A warehouse also needs declarative table-level
expectations — the Delta Live Tables / dbt-test pattern: declare named
rules, split rows into valid/violating streams (P1's routing generalized
from "parses" to arbitrary predicates), and report per-rule violation
counts.

Scale: rules are row-local Column expressions — the split is map-only
(zero shuffle, rules evaluated once per row via a shared array column),
and the report is one partial-aggregated pass (|rules| counters per
partition, merged map-side). Referential integrity is the one non-local
rule: a left-anti join against the parent's key set — broadcast when the
parent is a dim, shuffle otherwise; never a driver-side collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_constraints(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Evaluate named row-level expectations in one pass.

    Returns ``(valid, violations, report)``:

    - ``valid``: rows satisfying every rule (NULL rule results count as
      violations, like SQL CHECK constraints under ``NOT valid``);
    - ``violations``: the complement, with ``failed_rules`` listing the
      names of every rule the row breaks;
    - ``report``: one row per rule — ``rule, violation_ct, total_ct``.
    """
    failed = F.array_compact(
        F.array(
            *[
                F.when(~F.coalesce(cond, F.lit(False)), F.lit(name))
                for name, cond in rules.items()
            ]
        )
    )
    tagged = df.withColumn("failed_rules", failed)
    valid = tagged.filter(F.size("failed_rules") == 0).drop("failed_rules")
    violations = tagged.filter(F.size("failed_rules") > 0)

    counters = [
        F.sum(
            F.when(~F.coalesce(cond, F.lit(False)), F.lit(1)).otherwise(F.lit(0))
        ).alias(name)
        for name, cond in rules.items()
    ] + [F.count(F.lit(1)).alias("_total")]
    wide = df.agg(*counters)
    report = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("rule"),
                        F.col(name).cast("long").alias("violation_ct"),
                        F.col("_total").cast("long").alias("total_ct"),
                    )
                    for name in rules
                ]
            )
        ).alias("r")
    ).select("r.rule", "r.violation_ct", "r.total_ct")
    return valid, violations, report


def ri_violations(child: DataFrame, parent: DataFrame, fk: str, pk: str) -> DataFrame:
    """Referential-integrity check: child rows whose ``fk`` has no match
    in the parent's ``pk`` (NULL fks are orphans too, matching a NOT NULL
    REFERENCES constraint). One anti-join — broadcast for dim parents,
    shuffle otherwise; AQE decides."""
    keys = parent.select(F.col(pk).alias("_ri_pk")).distinct()
    return child.join(keys, child[fk] == F.col("_ri_pk"), "left_anti")
