"""Q12/T4: search filters (SURVEY §2.5; reference search_filters.py:25-169).

SearchFilters carries a node-label filter plus CNF date filters —
an OR-of-AND lists of (comparison op, value) per temporal field —
compiled into a single Spark Column predicate.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime
from enum import Enum

from pyspark.sql import Column
from pyspark.sql import functions as F


class ComparisonOperator(str, Enum):  # reference search_filters.py:25-33
    equals = "="
    not_equals = "<>"
    greater_than = ">"
    less_than = "<"
    greater_than_equal = ">="
    less_than_equal = "<="


@dataclass
class DateFilter:  # reference search_filters.py:36-40
    date: datetime
    comparison_operator: ComparisonOperator


@dataclass
class SearchFilters:  # reference search_filters.py:43-60
    node_labels: list[str] | None = None
    valid_at: list[list[DateFilter]] | None = None        # CNF: OR of AND-lists
    invalid_at: list[list[DateFilter]] | None = None
    created_at: list[list[DateFilter]] | None = None
    expired_at: list[list[DateFilter]] | None = None
    _fields: tuple = field(default=("valid_at", "invalid_at", "created_at", "expired_at"),
                           repr=False)


def _cmp(col: Column, f: DateFilter) -> Column:
    op = f.comparison_operator
    v = F.lit(f.date)
    return {
        ComparisonOperator.equals: col == v,
        ComparisonOperator.not_equals: col != v,
        ComparisonOperator.greater_than: col > v,
        ComparisonOperator.less_than: col < v,
        ComparisonOperator.greater_than_equal: col >= v,
        ComparisonOperator.less_than_equal: col <= v,
    }[op]


def date_filter_column(cnf: list[list[DateFilter]], colname: str) -> Column:
    """OR over the outer list, AND within each inner list
    (reference search_filters.py:63-169 query construction)."""
    ors = None
    for and_list in cnf:
        ands = None
        for f in and_list:
            c = _cmp(F.col(colname), f)
            ands = c if ands is None else (ands & c)
        ors = ands if ors is None else (ors | ands)
    return ors if ors is not None else F.lit(True)


def edge_filter(filters: SearchFilters) -> Column:
    cond = F.lit(True)
    for name in ("valid_at", "invalid_at", "created_at", "expired_at"):
        cnf = getattr(filters, name)
        if cnf:
            cond = cond & date_filter_column(cnf, name)
    return cond


def node_filter(filters: SearchFilters) -> Column:
    if filters.node_labels:
        cond = F.lit(False)
        for lab in filters.node_labels:
            cond = cond | F.array_contains(F.col("labels"), lab)
        return cond
    return F.lit(True)
