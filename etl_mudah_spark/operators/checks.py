"""Declarative data-quality constraints, evaluated in one scan.

The Deequ/Great-Expectations capability re-expressed as pure DataFrame
algebra: a check suite is a list of row-level predicates plus
key-uniqueness assertions, and the report is one long-form DataFrame
``(check, column, violations, total_rows, passed)``.

Scale design — the part that matters at 100 TB:

- ALL row-level constraints (not-null, range, set membership, regex,
  arbitrary Column predicates) fold into a SINGLE global aggregate:
  one conditional-sum per constraint inside one ``agg()`` — one scan,
  one map-side-combined reduction, regardless of how many constraints
  the suite holds. Adding a constraint adds a column to the partial
  aggregate buffer, not a pass over the data.
- UNIQUENESS is the one constraint class that genuinely needs a
  shuffle (violations are a property of key GROUPS, not rows): each
  uniqueness check costs one groupBy on its key columns, counting
  rows in groups of size > 1. These run as separate branches unioned
  into the report; AQE reuses the shared scan where the source is a
  cached/file relation.
- The report is constraint-sized (rows = number of checks), never
  data-sized: safe to ``collect()``, publish, or gate a pipeline on
  (``fail_on_violations`` raises with the offending checks inline —
  the circuit-breaker a write pipeline wants BEFORE publishing a bad
  snapshot via operators/manifest.py).

Reference analog: none — the reference inserts scraped rows into
Postgres unvalidated (dags/dag.py:243-266); a malformed price or a
re-scraped duplicate lands silently. This suite is what stands between
an ingest and a published version.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RowCheck:
    """A row-level constraint: ``name`` + a predicate that must hold
    for every row (NULL predicate results count as violations unless
    the predicate itself handles NULL — use :func:`not_null` /
    :func:`in_range` / :func:`in_set` / :func:`matches` for the usual
    null-tolerant shapes)."""

    name: str
    column: str
    predicate: Column


@dataclass(frozen=True)
class UniqueCheck:
    """Key-uniqueness constraint: no two rows may share ``key_cols``.
    ``violations`` reports the number of EXCESS rows (group size − 1
    summed over oversized groups) — 0 iff the key is unique."""

    key_cols: tuple[str, ...]
    name: str = field(default="")

    def label(self) -> str:
        return self.name or f"unique({','.join(self.key_cols)})"


def not_null(col: str) -> RowCheck:
    return RowCheck(f"not_null({col})", col, F.col(col).isNotNull())


def in_range(col: str, lo, hi) -> RowCheck:
    """NULL passes (pair with :func:`not_null` to also forbid NULL) —
    matching SQL CHECK semantics where NULL comparisons don't fail."""
    c = F.col(col)
    return RowCheck(
        f"in_range({col})", col, c.isNull() | ((c >= F.lit(lo)) & (c <= F.lit(hi)))
    )


def in_set(col: str, values: Sequence) -> RowCheck:
    c = F.col(col)
    return RowCheck(f"in_set({col})", col, c.isNull() | c.isin(list(values)))


def matches(col: str, regex: str) -> RowCheck:
    c = F.col(col)
    return RowCheck(f"matches({col})", col, c.isNull() | c.rlike(regex))


def check_table(
    df: DataFrame,
    row_checks: Sequence[RowCheck] = (),
    unique_checks: Sequence[UniqueCheck] = (),
) -> DataFrame:
    """Evaluate the suite; returns the long-form report sorted by
    check name: ``(check, column, violations, total_rows, passed)``.
    One scan for every row check together; one groupBy per uniqueness
    check. Empty-input tables report 0 violations everywhere."""
    names = [rc.name for rc in row_checks] + [uc.label() for uc in unique_checks]
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        raise ValueError(
            f"check_table: duplicate check names {sorted(dupes)!r} — "
            "give RowCheck/UniqueCheck instances distinct names"
        )
    aggs = [F.count(F.lit(1)).alias("_total")]
    for rc in row_checks:
        aggs.append(
            F.sum(
                F.when(F.coalesce(rc.predicate, F.lit(False)), 0).otherwise(1)
            ).alias(rc.name)
        )
    row_report = None
    if row_checks:
        one = df.agg(*aggs)
        per_check = [
            one.select(
                F.lit(rc.name).alias("check"),
                F.lit(rc.column).alias("column"),
                F.coalesce(F.col(rc.name), F.lit(0)).alias("violations"),
                F.col("_total").alias("total_rows"),
            )
            for rc in row_checks
        ]
        row_report = per_check[0]
        for p in per_check[1:]:
            row_report = row_report.unionByName(p)

    uniq_reports = []
    for uc in unique_checks:
        total = df.agg(F.count(F.lit(1)).alias("_total"))
        excess = (
            df.groupBy(*uc.key_cols)
            .agg(F.count(F.lit(1)).alias("_n"))
            .agg(
                F.coalesce(
                    F.sum(F.when(F.col("_n") > 1, F.col("_n") - 1)), F.lit(0)
                ).alias("violations")
            )
        )
        uniq_reports.append(
            excess.crossJoin(F.broadcast(total)).select(
                F.lit(uc.label()).alias("check"),
                F.lit(",".join(uc.key_cols)).alias("column"),
                F.col("violations").cast("long").alias("violations"),
                F.col("_total").alias("total_rows"),
            )
        )

    parts = ([row_report] if row_report is not None else []) + uniq_reports
    if not parts:
        raise ValueError("check_table: empty check suite")
    report = parts[0]
    for p in parts[1:]:
        report = report.unionByName(p)
    return report.withColumn("passed", F.col("violations") == 0).orderBy("check")


def fail_on_violations(report: DataFrame) -> None:
    """Pipeline circuit-breaker: collect the (check-sized) report and
    raise with the failing rows inline. Call between computing an
    ingest batch and publishing it (operators/manifest.py) — a failed
    suite must mean the version pointer never flips."""
    bad = [r for r in report.collect() if not r["passed"]]
    if bad:
        lines = "; ".join(
            f"{r['check']}: {r['violations']}/{r['total_rows']} rows" for r in bad
        )
        raise ValueError(f"data-quality violations — {lines}")


def tag_violations(
    df: DataFrame, row_checks: Sequence[RowCheck], col: str = "violated"
) -> DataFrame:
    """Per-ROW constraint evaluation: append an array column listing
    the names of every violated row check (empty array = clean row).
    Pure Column algebra — the tags cost one projection inside the same
    scan, no shuffle, no second pass; the complement of
    :func:`check_table`'s constraint-sized report when you need to know
    WHICH rows failed, not just how many."""
    tags = F.array(
        *[
            F.when(~F.coalesce(rc.predicate, F.lit(False)), F.lit(rc.name))
            for rc in row_checks
        ]
    )
    return df.withColumn(col, F.filter(tags, lambda x: x.isNotNull()))


def split_quarantine(
    df: DataFrame, row_checks: Sequence[RowCheck], col: str = "violated"
) -> tuple[DataFrame, DataFrame]:
    """Dead-letter split: ``(clean, rejects)`` where rejects carry the
    ``violated`` tag array. The ingest-pipeline shape: merge ``clean``
    into the target, append ``rejects`` to a quarantine table for
    triage, and the bad rows never block the stream NOR silently land
    in the published table (the middle ground between check_table's
    all-or-nothing circuit breaker and no validation at all). Both
    sides derive from one tagged plan; with the source cached or
    file-backed the scan is shared."""
    tagged = tag_violations(df, row_checks, col)
    clean = tagged.where(F.size(F.col(col)) == 0).drop(col)
    rejects = tagged.where(F.size(F.col(col)) > 0)
    return clean, rejects


def fk_violations(
    child: DataFrame,
    child_cols: Sequence[str],
    parent: DataFrame,
    parent_cols: Sequence[str],
) -> DataFrame:
    """Referential-integrity violations: child rows whose (non-null)
    foreign key has no match in the parent — one left_anti join on the
    key, the minimum possible work for FK validation (NULL FKs are
    excluded, matching SQL FK semantics where NULL references are
    legal; add :func:`not_null` checks to forbid them). At 100 TB the
    anti join broadcasts when the parent is a dim; co-locate via
    shared bucketing (operators/layout.py) when both sides are facts.
    """
    ck, pk = list(child_cols), list(parent_cols)
    if len(ck) != len(pk):
        raise ValueError("child_cols and parent_cols must align")
    non_null = None
    for c in ck:
        cond = F.col(c).isNotNull()
        non_null = cond if non_null is None else (non_null & cond)
    cond = [child[c].eqNullSafe(parent[p]) for c, p in zip(ck, pk)]
    on = cond[0]
    for extra in cond[1:]:
        on = on & extra
    return child.where(non_null).join(
        parent.select(*pk), on, "left_anti"
    )


def fk_check_report(
    child: DataFrame,
    child_cols: Sequence[str],
    parent: DataFrame,
    parent_cols: Sequence[str],
    name: str | None = None,
) -> DataFrame:
    """The :func:`check_table`-shaped one-row report for an FK
    constraint: ``(check, column, violations, total_rows, passed)`` —
    unionByName-compatible with a row/uniqueness report so one suite
    covers intra-table and cross-table integrity."""
    label = name or f"fk({','.join(child_cols)})"
    total = child.agg(F.count(F.lit(1)).alias("_total"))
    bad = fk_violations(child, child_cols, parent, parent_cols).agg(
        F.count(F.lit(1)).alias("violations")
    )
    return bad.crossJoin(F.broadcast(total)).select(
        F.lit(label).alias("check"),
        F.lit(",".join(child_cols)).alias("column"),
        F.col("violations").cast("long").alias("violations"),
        F.col("_total").alias("total_rows"),
        (F.col("violations") == 0).alias("passed"),
    )


def fd_audit(
    df: DataFrame,
    fds: Sequence[tuple[str, str]],
) -> DataFrame:
    """Functional-dependency audit: one row per candidate FD lhs→rhs —
    ``(fd, n_rows, n_lhs_groups, violating_groups, max_distinct_rhs,
    repair_rows, g3_error)``.

    ``repair_rows`` is the g3 measure numerator: the minimum number of
    rows to delete so the FD holds exactly (per lhs group, everything
    outside the largest rhs class); ``g3_error`` is its share of all
    rows — 0.0 means the dependency holds, small values mean "holds
    modulo dirty rows", large values mean there is no dependency. The
    schema-discovery primitive a warehouse runs before trusting a
    column as a lookup key, and the quantitative version of the
    row-level checks above. NULL is a regular value on both sides
    (two NULL rhs agree); pre-filter if not wanted.

    Scale shape (100 TB): per FD exactly two hash aggregations with
    map-side partials — (lhs, rhs) counts, then per-lhs stats — and a
    final 1-row reduction; the union across FDs is a union of 1-row
    frames. No window, no join, no collect; skew-proof because the
    second aggregation's input is already |distinct lhs| rows.

    Reference analog: none — the reference trusts its schema
    (dags/dag.py DDL); FD discovery is what replaces that trust when
    the data arrives from a crawl instead of your own scraper.
    """
    if not fds:
        raise ValueError("fds must name at least one lhs->rhs pair")
    outs = []
    for lhs, rhs in fds:
        pairs = df.groupBy(lhs, rhs).agg(F.count("*").alias("_c"))
        per_lhs = pairs.groupBy(lhs).agg(
            F.count("*").alias("_nd"),
            F.sum("_c").alias("_n"),
            F.max("_c").alias("_mx"),
        )
        stats = per_lhs.agg(
            F.sum("_n").cast("bigint").alias("n_rows"),
            F.count("*").cast("bigint").alias("n_lhs_groups"),
            F.sum(F.when(F.col("_nd") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("violating_groups"),
            F.max("_nd").cast("bigint").alias("max_distinct_rhs"),
            F.sum(F.col("_n") - F.col("_mx")).cast("bigint").alias(
                "repair_rows"
            ),
        )
        outs.append(
            stats.select(
                F.lit(f"{lhs}->{rhs}").alias("fd"),
                "n_rows",
                "n_lhs_groups",
                "violating_groups",
                "max_distinct_rhs",
                "repair_rows",
                (F.col("repair_rows") * 1.0 / F.col("n_rows")).alias(
                    "g3_error"
                ),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
