"""Shared Column-expression helpers for the ops modules."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def let_bound(col: Column, body) -> Column:
    """Let-bind an expression so downstream references evaluate it
    once: element_at(transform(array(x), f), 1). Catalyst does not
    CSE an aggregate/array expression referenced inside per-element
    lambdas — without the binding an O(d) pass silently becomes
    O(d^2) (measured: 19 s vs <1 s on the winnowing bench in round
    4). `body` receives the bound Column and returns the result
    expression."""
    return F.element_at(F.transform(F.array(col), body), 1)
