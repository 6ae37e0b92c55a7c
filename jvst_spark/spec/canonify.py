"""canonify: reduced DAG -> deterministically-ordered normal form.

The analogue of jvst's canonify pass (jvst_cnode_canonify,
src/validate_constraints.c:5877-5885). The reference's canonify does two
jobs: (1) rewrite into VM-friendly forms (REQUIRED->bitmask,
STR_MATCH->MATCH_SWITCH DFAs) and (2) deterministic child ordering for
reproducible output (qsort by node type, src/validate_constraints.c:
5739-5783; matchset sorting 2744-2888). Job (1) is unnecessary under
columnar lowering; job (2) we keep — stable ordering gives stable plan
hashes, stable golden tests, and deterministic violation-row order
(the span-sequence-equality invariant requires deterministic output).
"""

from __future__ import annotations

from jvst_spark.spec.nodes import (
    And,
    ArrContains,
    ArrItems,
    Node,
    Not,
    ObjPropNames,
    ObjPropSet,
    Or,
    Switch,
    Xor,
)
from jvst_spark.spec.simplify import simplify


def canonify(node: Node) -> Node:
    """Deterministic normal form: children of commutative control nodes
    sorted by (type rank, repr); simplify re-run after reorder (the
    reference also re-simplifies between canonify passes,
    src/validate_constraints.c:5877-5885)."""
    return simplify(_order(simplify(node)))


def _order(node: Node, memo: dict | None = None) -> Node:
    if memo is None:
        memo = {}
    hit = memo.get(id(node))
    if hit is not None:
        return hit
    out = _order_impl(node, memo)
    memo[id(node)] = out
    return out


def _order_impl(node: Node, memo: dict) -> Node:
    if isinstance(node, And):
        return And(_sorted_terms(node.terms, memo))
    if isinstance(node, Or):
        return Or(_sorted_terms(node.terms, memo))
    if isinstance(node, Xor):
        # oneOf arms keep user order: XOR is commutative logically but
        # violation attribution reads better in source order; sorting
        # only AND/OR matches the reference's determinism goal.
        return Xor(tuple(_order(t, memo) for t in node.terms))
    if isinstance(node, Not):
        return Not(_order(node.term, memo))
    if isinstance(node, Switch):
        return Switch(tuple((t, _order(n, memo)) for t, n in node.arms))
    if isinstance(node, ObjPropSet):
        return ObjPropSet(
            tuple(sorted(((k, _order(v, memo)) for k, v in node.props))),
            tuple(sorted(((p, _order(v, memo)) for p, v in node.patterns))),
            _order(node.additional, memo),
        )
    if isinstance(node, ObjPropNames):
        return ObjPropNames(_order(node.name_schema, memo))
    if isinstance(node, ArrItems):
        return ArrItems(
            tuple(_order(p, memo) for p in node.positional),
            _order(node.additional, memo)
        )
    if isinstance(node, ArrContains):
        return ArrContains(_order(node.schema, memo))
    return node


def _sorted_terms(terms, memo: dict | None = None) -> tuple:
    ordered = [_order(t, memo) for t in terms]
    return tuple(sorted(ordered, key=lambda n: n.sort_key()))
