"""simplify: ConstraintNode DAG -> reduced DAG.

The analogue of jvst's cnode simplifier (jvst_cnode_simplify,
src/validate_constraints.c:4726-4857). Ports the rewrites that still pay
off under columnar execution (SURVEY.md §4.1); rewrites Catalyst already
performs (constant folding, boolean short-circuit at runtime) are kept
anyway because they shrink the *compiled plan* — fewer Column
expressions, fewer violation checks — and make golden trees stable.

Rules (reference file:line for each):
- AND/OR short-circuit + neutral-drop + singleton unwrap
  (src/validate_constraints.c:4230-4271)
- flatten nested like control nodes (cnode_simplify_ctrl_combine_like,
  src/validate_constraints.c:2530-2561)
- merge AND'd/OR'd SWITCH nodes arm-wise
  (cnode_simplify_andor_switches, src/validate_constraints.c:2182-2261)
- merge AND'd ObjPropSets (cnode_simplify_and_propsets,
  src/validate_constraints.c:2263-2452) — via compile-time set algebra
  over static key names instead of DFA products
- merge AND'd required sets (cnode_simplify_and_required,
  src/validate_constraints.c:2453-2514)
- dedupe AND'd ArrUnique (src/validate_constraints.c:4198-4220)
- merge AND'd ArrItems position-wise (cnode_simplify_and_items,
  src/validate_constraints.c:4034-4197)
- intersect AND'd numeric/count ranges; coalesce OR'd ranges
  (src/validate_constraints.c:3395-4033)
- NOT pushdown over Valid/Invalid/Not/Switch
  (src/validate_constraints.c:4561-4671)
- XOR degenerate-case elimination (src/validate_constraints.c:4446-4560)
  — general XOR stays a node (columnar exactly-one is cheap)
- enum set algebra (intersect under AND, union under OR)
"""

from __future__ import annotations

from typing import List, Optional, Tuple, Type

from jvst_spark import errors as E
from jvst_spark.spec import redialect
from jvst_spark.spec.nodes import (
    JSON_TYPES,
    And,
    ArrContains,
    ArrItems,
    ArrUnique,
    EnumMatch,
    Invalid,
    ItemRange,
    Node,
    Not,
    NumInteger,
    NumMultipleOf,
    NumRange,
    ObjPropNames,
    ObjPropSet,
    ObjRequired,
    Or,
    PropRange,
    Ref,
    StrLength,
    StrMatch,
    Switch,
    Valid,
    Xor,
)

_COUNT_RANGES: Tuple[Type[Node], ...] = (StrLength, ItemRange, PropRange)


def _enum_subset(enums: List[EnumMatch], canon_set) -> EnumMatch:
    """EnumMatch restricted to `canon_set`, raw_json kept aligned."""
    raw_by_canon = {}
    for e in enums:
        raws = e.raw_json if len(e.raw_json) == len(e.canon_values) else ()
        for i, c in enumerate(e.canon_values):
            if raws:
                raw_by_canon.setdefault(c, raws[i])
    items = sorted(canon_set)
    return EnumMatch(
        tuple(items), tuple(raw_by_canon.get(c, "null") for c in items)
    )


def simplify(node: Node) -> Node:
    """Rewrite to fixpoint (the reference simplifies recursively once;
    we iterate because rule interactions can cascade). Each pass is
    memoized on node IDENTITY: translate's ref inlining shares subtree
    objects, and an unmemoized walk visits a shared subtree once per
    path (exponential on diamond-shaped ref graphs)."""
    for _ in range(16):
        nxt = _simplify1(node, {})
        if nxt == node:
            return nxt
        node = nxt
    return node


def _simplify1(node: Node, memo: dict | None = None) -> Node:
    if memo is None:
        memo = {}
    hit = memo.get(id(node))
    if hit is not None:
        return hit
    out = _simplify1_impl(node, memo)
    memo[id(node)] = out
    return out


def _simplify1_impl(node: Node, memo: dict) -> Node:
    if isinstance(node, And):
        return _simplify_and([_simplify1(t, memo) for t in node.terms])
    if isinstance(node, Or):
        return _simplify_or([_simplify1(t, memo) for t in node.terms])
    if isinstance(node, Xor):
        return _simplify_xor([_simplify1(t, memo) for t in node.terms])
    if isinstance(node, Not):
        return _simplify_not(_simplify1(node.term, memo))
    if isinstance(node, Switch):
        arms = tuple((t, _simplify1(n, memo)) for t, n in node.arms)
        if all(isinstance(n, Valid) for _, n in arms):
            return Valid()
        inv = [n for _, n in arms if isinstance(n, Invalid)]
        if len(inv) == len(arms):
            return inv[0]
        return Switch(arms)
    if isinstance(node, NumRange):
        if node.is_empty():
            return Invalid(E.INVALID_NUMBER)
        if node.is_full():
            return Valid()
        return node
    if isinstance(node, StrLength):
        if node.is_empty():
            return Invalid(E.INVALID_STRING)
        if node.is_full():
            return Valid()
        return node
    if isinstance(node, ItemRange):
        if node.is_empty():
            return Invalid(E.INVALID_ARRAY)
        if node.is_full():
            return Valid()
        return node
    if isinstance(node, PropRange):
        if node.is_empty():
            return Invalid(E.INVALID_TOO_MANY_PROPS)
        if node.is_full():
            return Valid()
        return node
    if isinstance(node, EnumMatch) and not node.canon_values:
        return Invalid(E.INVALID_MATCH_CASE)
    if isinstance(node, ObjPropSet):
        props = tuple((k, _simplify1(v, memo)) for k, v in node.props)
        pats = tuple((p, _simplify1(v, memo)) for p, v in node.patterns)
        addl = _simplify1(node.additional, memo)
        # all-valid propset constrains nothing
        if (
            all(isinstance(v, Valid) for _, v in props)
            and all(isinstance(v, Valid) for _, v in pats)
            and isinstance(addl, Valid)
        ):
            return Valid()
        return ObjPropSet(props, pats, addl)
    if isinstance(node, ObjPropNames):
        inner = _simplify1(node.name_schema, memo)
        if isinstance(inner, Valid):
            return Valid()
        return ObjPropNames(inner)
    if isinstance(node, ArrItems):
        pos = tuple(_simplify1(p, memo) for p in node.positional)
        addl = _simplify1(node.additional, memo)
        if all(isinstance(p, Valid) for p in pos) and isinstance(addl, Valid):
            return Valid()
        return ArrItems(pos, addl)
    if isinstance(node, ArrContains):
        inner = _simplify1(node.schema, memo)
        if isinstance(inner, Invalid):
            # contains(false): no element can ever satisfy
            return Invalid(E.INVALID_UNSATISFIED_CONTAINS)
        return ArrContains(inner)
    return node


# ---------------------------------------------------------------- AND


def _simplify_and(terms: List[Node]) -> Node:
    # flatten + short-circuit + neutral-drop
    flat: List[Node] = []
    for t in terms:
        if isinstance(t, And):
            flat.extend(t.terms)
        elif isinstance(t, Valid):
            continue
        else:
            flat.append(t)
    for t in flat:
        if isinstance(t, Invalid):
            return t

    out: List[Node] = []

    # merge AND'd switches arm-wise
    switches = [t for t in flat if isinstance(t, Switch)]
    rest = [t for t in flat if not isinstance(t, Switch)]
    if len(switches) >= 2:
        arms = []
        for i, tname in enumerate(JSON_TYPES):
            merged = _simplify_and([s.arms[i][1] for s in switches])
            arms.append((tname, merged))
        sw: Node = Switch(tuple(arms))
        sw = _simplify1(sw)
        if isinstance(sw, Invalid):
            return sw
        if not isinstance(sw, Valid):
            out.append(sw)
    else:
        out.extend(switches)

    # intersect numeric ranges
    ranges = [t for t in rest if isinstance(t, NumRange)]
    rest = [t for t in rest if not isinstance(t, NumRange)]
    if ranges:
        merged_r = _intersect_num_ranges(ranges)
        if merged_r.is_empty():
            return Invalid(E.INVALID_NUMBER)
        if not merged_r.is_full():
            out.append(merged_r)

    # intersect count ranges, per kind
    for cls, code in (
        (StrLength, E.INVALID_STRING),
        (ItemRange, E.INVALID_ARRAY),
        (PropRange, E.INVALID_TOO_MANY_PROPS),
    ):
        rs = [t for t in rest if isinstance(t, cls)]
        rest = [t for t in rest if not isinstance(t, cls)]
        if rs:
            lo = max(r.lo for r in rs)
            hi_vals = [r.hi for r in rs if r.hi is not None]
            hi = min(hi_vals) if hi_vals else None
            m = cls(lo, hi)
            if m.is_empty():
                return Invalid(code)
            if not m.is_full():
                out.append(m)

    # union required sets
    reqs = [t for t in rest if isinstance(t, ObjRequired)]
    rest = [t for t in rest if not isinstance(t, ObjRequired)]
    if reqs:
        keys = sorted({k for r in reqs for k in r.keys})
        out.append(ObjRequired(tuple(keys)))

    # dedupe ArrUnique
    if any(isinstance(t, ArrUnique) for t in rest):
        rest = [t for t in rest if not isinstance(t, ArrUnique)]
        out.append(ArrUnique())

    # intersect enum sets
    enums = [t for t in rest if isinstance(t, EnumMatch)]
    rest = [t for t in rest if not isinstance(t, EnumMatch)]
    if enums:
        acc = set(enums[0].canon_values)
        for e in enums[1:]:
            acc &= set(e.canon_values)
        if not acc:
            return Invalid(E.INVALID_MATCH_CASE)
        out.append(_enum_subset(enums, acc))

    # merge AND'd ArrItems position-wise
    items = [t for t in rest if isinstance(t, ArrItems)]
    rest = [t for t in rest if not isinstance(t, ArrItems)]
    if len(items) >= 2:
        merged_i = _merge_and_items(items)
        if isinstance(merged_i, Invalid):
            return merged_i
        if not isinstance(merged_i, Valid):
            out.append(merged_i)
    else:
        out.extend(items)

    # merge AND'd ObjPropSets (when statically mergeable)
    psets = [t for t in rest if isinstance(t, ObjPropSet)]
    rest = [t for t in rest if not isinstance(t, ObjPropSet)]
    if len(psets) >= 2:
        merged_p = _merge_and_propsets(psets)
        out.extend(merged_p)
    else:
        out.extend(psets)

    out.extend(rest)

    # dedupe identical terms, preserve first-seen order
    seen = set()
    dedup: List[Node] = []
    for t in out:
        if t not in seen:
            seen.add(t)
            dedup.append(t)

    if not dedup:
        return Valid()
    if len(dedup) == 1:
        return dedup[0]
    return And(tuple(dedup))


def _intersect_num_ranges(rs: List[NumRange]) -> NumRange:
    lo, hi = None, None
    lo_excl = hi_excl = False
    for r in rs:
        if r.lo is not None and (lo is None or r.lo > lo or (r.lo == lo and r.lo_excl)):
            lo, lo_excl = r.lo, r.lo_excl
        if r.hi is not None and (hi is None or r.hi < hi or (r.hi == hi and r.hi_excl)):
            hi, hi_excl = r.hi, r.hi_excl
    return NumRange(lo, hi, lo_excl, hi_excl)


def _merge_and_items(items: List[ArrItems]) -> Node:
    n = max(len(it.positional) for it in items)
    pos: List[Node] = []
    for i in range(n):
        parts = [
            it.positional[i] if i < len(it.positional) else it.additional
            for it in items
        ]
        pos.append(_simplify_and(parts))
    addl = _simplify_and([it.additional for it in items])
    merged = ArrItems(tuple(pos), addl)
    return _simplify1(merged)


def _merge_and_propsets(psets: List[ObjPropSet]) -> List[Node]:
    """Merge AND'd property sets via static-key set algebra.

    A static key k is checked, for each set i, against: props_i[k] if
    present, every pattern of set i matching k, and additional_i iff
    neither applies. Dynamic keys require pattern-overlap reasoning, so
    we only merge when at most one set has patterns (jvst solves the
    general case with DFA products, src/validate_constraints.c:3035-3237;
    under vectorized rlike the unmerged AND is already cheap)."""
    with_pats = [p for p in psets if p.patterns]
    if len(with_pats) > 1:
        return list(psets)

    all_keys = sorted({k for p in psets for k, _ in p.props})
    merged_props: List[Tuple[str, Node]] = []
    for k in all_keys:
        parts: List[Node] = []
        for p in psets:
            d = dict(p.props)
            matched = False
            if k in d:
                parts.append(d[k])
                matched = True
            for pat, pnode in p.patterns:
                if redialect.search(pat, k):
                    parts.append(pnode)
                    matched = True
            if not matched:
                parts.append(p.additional)
        merged_props.append((k, _simplify_and(parts)))

    additionals = [p.additional for p in psets]
    merged_addl = _simplify_and(additionals)

    merged_pats: List[Tuple[str, Node]] = []
    if with_pats:
        pset = with_pats[0]
        others_addl = _simplify_and(
            [p.additional for p in psets if p is not pset]
        )
        for pat, pnode in pset.patterns:
            merged_pats.append((pat, _simplify_and([pnode, others_addl])))

    merged = ObjPropSet(tuple(merged_props), tuple(merged_pats), merged_addl)
    m = _simplify1(merged)
    return [] if isinstance(m, Valid) else [m]


# ----------------------------------------------------------------- OR


def _simplify_or(terms: List[Node]) -> Node:
    flat: List[Node] = []
    first_invalid: Optional[Invalid] = None
    for t in terms:
        if isinstance(t, Or):
            flat.extend(t.terms)
        elif isinstance(t, Invalid):
            # dropped as a neutral element; keep the first one's code so
            # an all-invalid OR reports the original failure reason
            if first_invalid is None:
                first_invalid = t
        else:
            flat.append(t)
    for t in flat:
        if isinstance(t, Valid):
            return Valid()
    if not flat:
        return first_invalid or Invalid(E.INVALID_SPLIT_CONDITION)

    out: List[Node] = []

    # merge OR'd switches arm-wise
    switches = [t for t in flat if isinstance(t, Switch)]
    rest = [t for t in flat if not isinstance(t, Switch)]
    if len(switches) >= 2:
        arms = []
        for i, tname in enumerate(JSON_TYPES):
            arms.append((tname, _simplify_or([s.arms[i][1] for s in switches])))
        sw = _simplify1(Switch(tuple(arms)))
        if isinstance(sw, Valid):
            return sw
        if not isinstance(sw, Invalid):
            out.append(sw)
    else:
        out.extend(switches)

    # coalesce OR'd numeric ranges
    ranges = sorted(
        (t for t in rest if isinstance(t, NumRange)),
        key=lambda r: (
            float("-inf") if r.lo is None else r.lo,
            not r.lo_excl,
        ),
    )
    rest = [t for t in rest if not isinstance(t, NumRange)]
    out.extend(_coalesce_num_ranges(ranges))

    # coalesce OR'd count ranges, per kind (integer adjacency)
    for cls in _COUNT_RANGES:
        rs = sorted(
            (t for t in rest if isinstance(t, cls)), key=lambda r: r.lo
        )
        rest = [t for t in rest if not isinstance(t, cls)]
        merged: List[Node] = []
        for r in rs:
            if merged and isinstance(merged[-1], cls):
                prev = merged[-1]
                if prev.hi is None or r.lo <= prev.hi + 1:
                    hi = (
                        None
                        if prev.hi is None or r.hi is None
                        else max(prev.hi, r.hi)
                    )
                    merged[-1] = cls(prev.lo, hi)
                    continue
            merged.append(r)
        for m in merged:
            if m.is_full():
                return Valid()
        out.extend(merged)

    # union enum sets
    enums = [t for t in rest if isinstance(t, EnumMatch)]
    rest = [t for t in rest if not isinstance(t, EnumMatch)]
    if enums:
        acc = {v for e in enums for v in e.canon_values}
        out.append(_enum_subset(enums, acc))

    out.extend(rest)

    seen = set()
    dedup: List[Node] = []
    for t in out:
        if t not in seen:
            seen.add(t)
            dedup.append(t)

    if not dedup:
        return Invalid(E.INVALID_SPLIT_CONDITION)
    if len(dedup) == 1:
        return dedup[0]
    return Or(tuple(dedup))


def _coalesce_num_ranges(rs: List[NumRange]) -> List[Node]:
    """Union of sorted ranges -> minimal disjoint list
    (reference: OR'd ranges coalesced after sort,
    src/validate_constraints.c:3435-3552)."""
    merged: List[NumRange] = []
    for r in rs:
        if merged:
            p = merged[-1]
            p_hi = float("inf") if p.hi is None else p.hi
            r_lo = float("-inf") if r.lo is None else r.lo
            overlaps = r_lo < p_hi or (
                r_lo == p_hi and not (p.hi_excl and r.lo_excl)
            )
            if overlaps:
                r_hi = float("inf") if r.hi is None else r.hi
                if r_hi > p_hi or (r_hi == p_hi and p.hi_excl and not r.hi_excl):
                    merged[-1] = NumRange(p.lo, r.hi, p.lo_excl, r.hi_excl)
                continue
        merged.append(r)
    if len(merged) == 1 and merged[0].is_full():
        return [Valid()]
    return list(merged)


# ----------------------------------------------------------------- XOR


def _simplify_xor(terms: List[Node]) -> Node:
    flat = [t for t in terms if not isinstance(t, Invalid)]
    valids = sum(isinstance(t, Valid) for t in flat)
    if valids >= 2:
        return Invalid(E.INVALID_SPLIT_CONDITION)
    if valids == 1:
        others = [t for t in flat if not isinstance(t, Valid)]
        return _simplify_and([_simplify_not(t) for t in others])
    if not flat:
        return Invalid(E.INVALID_SPLIT_CONDITION)
    if len(flat) == 1:
        return flat[0]
    return Xor(tuple(flat))


# ----------------------------------------------------------------- NOT


def _simplify_not(term: Node) -> Node:
    if isinstance(term, Valid):
        return Invalid(E.INVALID_SPLIT_CONDITION)
    if isinstance(term, Invalid):
        return Valid()
    if isinstance(term, Not):
        return term.term
    if isinstance(term, Switch):
        # NOT pushdown over the type dispatch
        # (src/validate_constraints.c:4584-4616)
        arms = tuple((t, _simplify_not(n)) for t, n in term.arms)
        return _simplify1(Switch(arms))
    return Not(term)
