"""Declarative per-item conditions (the check-suite seed of the reference).

Reference: /root/reference/data_processing/detector.py:167-183 (_evaluate_cond
operator dispatch) and :234-270 (_filter_by_conds), driven by YAML rules
``{filter: <catalog predicate>, condition: {operator, value}}``
(samples/unified.yml:108-150). The catalog predicate is applied through the
data getter's ``check_itemId_cond`` (zabbix_psql_getter.py:281-293 — raw SQL
WHERE) — the exact analog of a Spark SQL expression string.

Spark realization: each rule is a semi-join (items matching the filter) plus a
vectorized predicate on the metric; items matching the filter but failing the
condition are removed. No per-item loops.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OPS = {">", "<", "=", ">=", "<="}


@dataclass(frozen=True)
class Condition:
    """One YAML rule: items matching ``filter_expr`` (over the catalog) must
    satisfy ``metric <operator> <value>`` (over the stats frame).

    ``operator is None`` is a pure-ignore rule: every matching item is
    removed unconditionally (reference: a rule without ``condition`` makes
    ``_evaluate_cond`` return False, detector.py:168-169 — e.g.
    "ignore uptime", samples/unified.yml:117-118)."""
    filter_expr: str
    metric: str          # e.g. "mean_h" or "diff"
    operator: str | None
    value: float | None


def apply_conditions(stats_df: DataFrame, catalog_df: DataFrame,
                     conds: list[Condition],
                     key: str = "itemid") -> DataFrame:
    """Return the surviving key set after all conditions.

    _filter_by_conds semantics: an item is removed iff it matches a rule's
    catalog filter AND fails that rule's metric condition. Items matching no
    filter survive. ``=`` maps to SQL equality (detector.py:177).
    """
    survivors = stats_df.select(key).distinct()
    for cond in conds:
        matched = catalog_df.filter(F.expr(cond.filter_expr)).select(key)
        if cond.operator is None:       # pure-ignore rule: drop all matches
            survivors = survivors.join(matched, key, "left_anti")
            continue
        if cond.operator not in _OPS:
            raise ValueError(f"unsupported operator {cond.operator!r}")
        op = "==" if cond.operator == "=" else cond.operator
        failing = (
            stats_df.join(matched, key, "left_semi")
                    .filter(~F.expr(f"{cond.metric} {op} {cond.value}"))
                    .select(key)
        )
        survivors = survivors.join(failing, key, "left_anti")
    return survivors
