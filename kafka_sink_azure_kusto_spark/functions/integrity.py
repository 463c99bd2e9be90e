"""Referential-integrity auditing for lakehouse tables (north-star op).

A training-data warehouse joins fact tables against dimensions
constantly; silently-broken foreign keys turn inner joins into row
loss. ``fk_audit`` measures each relation in ONE pass per relation:
total child rows, child rows whose FK has no parent (orphans), and the
distinct orphan key count — the triage numbers a data-quality dashboard
needs before anyone trusts a join.

Plan shape at scale: the parent side is reduced to DISTINCT keys before
the anti-join (the only state the join needs), the anti-join shuffles
on the key like the production join it is auditing would, and the
per-relation outputs are single aggregated rows unioned together —
nothing driver-side, nothing quadratic. NULL FKs are counted separately
(``n_null_fk``): a NULL FK is not an orphan (it matches the SQL join
semantics of never joining) but is usually a distinct data bug.

No reference citation: north-star addition (SURVEY §7.5).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fk_audit(
    child: DataFrame,
    fk_col: str,
    parent: DataFrame,
    pk_col: str,
    relation: str,
) -> DataFrame:
    """One-row audit of the ``child.fk_col → parent.pk_col`` relation:
    ``(relation, n_rows, n_null_fk, n_orphan_rows, n_orphan_keys)``.

    The final cross join pairs two ONE-ROW aggregates (it shows up as a
    BroadcastNestedLoopJoin of single rows in the plan — the scalar
    combine shape, constant cost at any scale)."""
    keys = parent.select(F.col(pk_col).alias("__pk")).distinct()
    # ONE child scan: a left join against the distinct parent keys
    # classifies every row in a single pass (matched / orphan / NULL
    # fk — a NULL fk never equals any key, and a NULL parent pk never
    # matches either, exactly like the anti-join it replaces), and one
    # aggregate derives all four counters. The previous shape scanned
    # the child twice (totals aggregate + anti-join aggregate), which
    # at fact-table scale doubles the heaviest input's I/O.
    orphan = F.col(fk_col).isNotNull() & F.col("__pk").isNull()
    joined = child.join(keys, child[fk_col] == keys["__pk"], "left")
    return joined.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col(fk_col).isNull(), 1)).alias("n_null_fk"),
        F.count(F.when(orphan, 1)).alias("n_orphan_rows"),
        F.countDistinct(F.when(orphan, F.col(fk_col))).alias("n_orphan_keys"),
    ).select(
        F.lit(relation).alias("relation"),
        "n_rows",
        "n_null_fk",
        "n_orphan_rows",
        "n_orphan_keys",
    )


def fk_audit_many(audits: list[DataFrame]) -> DataFrame:
    """Union the per-relation audit rows into one report frame."""
    if not audits:
        raise ValueError("fk_audit_many needs at least one audit")
    return reduce(DataFrame.unionByName, audits)


def fk_audit_sql(
    child_cte: str, fk_expr: str, parent_table: str, pk_col: str, relation: str
) -> str:
    """DuckDB oracle for one ``fk_audit`` row. ``child_cte`` is a
    subquery/table expression for the child side (so callers can inject
    deterministic corruption for testing the detector).

    NOT EXISTS, not NOT IN: with a NULL pk in the parent, NOT IN never
    evaluates TRUE (three-valued logic) and would report 0 orphans while
    the Spark side's left_anti join counts them — a silent oracle/engine
    divergence (round-6 advice)."""
    return f"""
    SELECT '{relation}' AS relation,
           (SELECT COUNT(*) FROM {child_cte} c) AS n_rows,
           (SELECT COUNT(*) FROM {child_cte} c WHERE {fk_expr} IS NULL) AS n_null_fk,
           (SELECT COUNT(*) FROM {child_cte} c
            WHERE {fk_expr} IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM {parent_table} p
                              WHERE p.{pk_col} = {fk_expr})) AS n_orphan_rows,
           (SELECT COUNT(DISTINCT {fk_expr}) FROM {child_cte} c
            WHERE {fk_expr} IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM {parent_table} p
                              WHERE p.{pk_col} = {fk_expr})) AS n_orphan_keys
    """
