"""Single-pass data-quality constraint checks (SURVEY.md §2-A/K hygiene).

The Deequ / dbt-test / Great-Expectations pattern re-expressed Spark-first:
every declared rule lowers to ONE aggregate expression, all rules evaluate
in a SINGLE aggregation pass over the table (no per-rule scans — at 100 TB
each extra scan is the whole cost), and the result unpivots to one row per
rule: ``(rule, violations, passed)``.

Rule constructors return ``(name, violations_expr)`` pairs; ``check`` is
the only executor. Uniqueness uses an exact ``count_distinct`` (two-phase
partial agg, still one job); everything else is a conditional count that
stays inside whole-stage codegen. A production harness would alert on
``passed = 0`` rows and archive the report next to the write manifest
(pairs with ``sources.write_parquet_observed``'s QC pass).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as _T

Rule = tuple[str, Column]


def not_null(col: str) -> Rule:
    """Violations: rows where ``col`` is NULL."""
    return (f"not_null({col})", F.count(F.when(F.col(col).isNull(), 1)))


def unique(*cols: str) -> Rule:
    """Violations: rows beyond the first per duplicate key tuple.

    The distinct is counted over a STRUCT of the columns, not the bare
    column list: ``count_distinct(a, b)`` skips any row where ANY column
    is NULL (SQL distinct-aggregate semantics), which would silently
    exempt NULL-keyed rows from the uniqueness check — and disagree with
    a row-tuple oracle. A struct with a NULL field is itself non-NULL, so
    every row participates, in Spark and in ANSI engines alike.
    """
    name = f"unique({', '.join(cols)})"
    return (
        name,
        F.count(F.lit(1))
        - F.count_distinct(F.struct(*[F.col(c) for c in cols])),
    )


def in_range(col: str, lo: float, hi: float) -> Rule:
    """Violations: non-NULL values outside [lo, hi]."""
    c = F.col(col)
    return (
        f"in_range({col}, {lo}, {hi})",
        F.count(F.when((c < lo) | (c > hi), 1)),
    )


def accepted_values(col: str, values: list[str]) -> Rule:
    """Violations: non-NULL values outside the accepted set."""
    return (
        f"accepted_values({col})",
        F.count(F.when(~F.col(col).isin(values), 1)),
    )


def min_rows(threshold: int) -> Rule:
    """Violations: the row shortfall below ``threshold`` (0 when met)."""
    return (
        f"min_rows({threshold})",
        F.greatest(F.lit(0).cast("long"), threshold - F.count(F.lit(1))),
    )


def check(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate every rule in one aggregation pass.

    Returns (rule string, violations bigint, passed bigint 0/1), one row
    per rule in declaration order — deterministic, so the report itself is
    oracle-checkable.
    """
    aggd = df.agg(
        *[expr.cast("long").alias(f"__r{i}") for i, (_, expr) in enumerate(rules)]
    )
    return aggd.select(F.explode(_report_array(rules)).alias("r")).select(
        "r.rule", "r.violations", "r.passed"
    )


def check_grouped(df: DataFrame, by: str, rules: list[Rule],
                  expected_groups: list | None = None) -> DataFrame:
    """Per-partition constraint report (the Deequ ``where``/grouped-analyzer
    analogy): every rule evaluates PER GROUP of ``by``, still in one
    aggregation pass — one shuffle on the group key, partial aggregation
    map-side, then the same array-unpivot as :func:`check`. ``min_rows``
    becomes a per-group minimum (per-partition freshness/completeness
    checks); uniqueness is per-group uniqueness.

    ``groupBy`` only yields rows for groups PRESENT in the data, so a
    completely missing partition — the worst completeness failure — would
    emit no report row at all (r7 review). ``expected_groups`` closes
    that hole: groups listed there but absent from the data get a failed
    report row per rule (``violations`` is NULL for rules other than
    ``min_rows`` — there is no count to report for a group that does not
    exist, and a ``-1`` sentinel would silently skew any downstream
    SUM/rate over violations (r8 review); ``min_rows`` reports its
    threshold as the shortfall), so an alerting harness watching
    ``passed = 0`` sees them.

    Returns (by, rule, violations, passed), one row per (group, rule) —
    deterministic and oracle-checkable like the global report. At 100 TB
    this is how validation tracks a partitioned table: one report row per
    (partition, rule) with no extra scans (the expected-group frame is a
    literal, broadcast anti-joined).
    """
    aggd = df.groupBy(by).agg(
        *[expr.cast("long").alias(f"__r{i}") for i, (_, expr) in enumerate(rules)]
    )
    report = aggd.select(
        F.col(by), F.explode(_report_array(rules)).alias("r")
    ).select(by, "r.rule", "r.violations", "r.passed")
    if expected_groups is not None:
        spark = df.sparkSession
        by_type = df.schema[by].dataType
        expected = spark.createDataFrame(
            [(g,) for g in expected_groups],
            _T.StructType([_T.StructField(by, by_type)]),
        )
        def _absent_violations(name: str) -> int | None:
            if name.startswith("min_rows("):
                return int(name[len("min_rows("):-1])
            return None  # NULL, not a -1 sentinel (r8 review)
        missing = expected.join(aggd.select(by), by, "left_anti")
        missing_rows = missing.select(
            F.col(by),
            F.explode(F.array(*[
                F.struct(
                    F.lit(name).alias("rule"),
                    F.lit(_absent_violations(name)).cast("long").alias(
                        "violations"),
                    F.lit(0).cast("long").alias("passed"),
                )
                for name, _ in rules
            ])).alias("r"),
        ).select(by, "r.rule", "r.violations", "r.passed")
        report = report.unionByName(missing_rows)
    return report


def _report_array(rules: list[Rule]) -> Column:
    return F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(f"__r{i}").alias("violations"),
                (F.col(f"__r{i}") == 0).cast("long").alias("passed"),
            )
            for i, (name, _) in enumerate(rules)
        ]
    )
