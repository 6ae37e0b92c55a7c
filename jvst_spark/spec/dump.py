"""Stage-dump pretty printer — debug parity with the reference's
cnode/IR dump paths (src/main.c:292-350: jvst can print the tree after
each compile stage). Our stages are translate -> simplify -> canonify
over the same DAG type, so one printer serves all three."""

from __future__ import annotations

from jvst_spark.spec.nodes import (
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


def pretty(node: Node, indent: int = 0) -> str:
    """One node per line, children indented — the shape of jvst's
    cnode dumps."""
    pad = "  " * indent
    nl = "\n"

    def kids(children, label=None):
        head = f"{pad}{label}" if label else ""
        return (head + nl if label else "") + nl.join(
            pretty(c, indent + 1) for c in children
        )

    if isinstance(node, Valid):
        return f"{pad}VALID"
    if isinstance(node, Invalid):
        return f"{pad}INVALID(code={node.code:#06x})"
    if isinstance(node, Switch):
        lines = [f"{pad}SWITCH"]
        for arm, sub in node.arms:
            if isinstance(sub, Invalid):
                continue  # jvst's dumps elide invalid arms too
            lines.append(f"{pad}  {arm}:")
            lines.append(pretty(sub, indent + 2))
        if len(lines) == 1:
            lines.append(f"{pad}  (all arms invalid)")
        return nl.join(lines)
    if isinstance(node, And):
        return kids(node.terms, "AND")
    if isinstance(node, Or):
        return kids(node.terms, "OR")
    if isinstance(node, Xor):
        return kids(node.terms, "XOR(exactly-1)")
    if isinstance(node, Not):
        return f"{pad}NOT{nl}" + pretty(node.term, indent + 1)
    if isinstance(node, NumRange):
        lo = f"({node.lo}" if node.lo_excl else f"[{node.lo}"
        hi = f"{node.hi})" if node.hi_excl else f"{node.hi}]"
        return f"{pad}NUM_RANGE {lo}, {hi}"
    if isinstance(node, NumInteger):
        return f"{pad}NUM_INTEGER"
    if isinstance(node, NumMultipleOf):
        return f"{pad}NUM_MULTIPLE_OF {node.divisor}"
    if isinstance(node, StrMatch):
        return f"{pad}STR_MATCH /{node.pattern}/"
    if isinstance(node, StrLength):
        return f"{pad}STR_LENGTH [{node.lo}, {node.hi}]"
    if isinstance(node, ObjRequired):
        return f"{pad}OBJ_REQUIRED {list(node.keys)}"
    if isinstance(node, PropRange):
        return f"{pad}PROP_RANGE [{node.lo}, {node.hi}]"
    if isinstance(node, ObjPropNames):
        return f"{pad}OBJ_PROP_NAMES{nl}" + pretty(node.name_schema, indent + 1)
    if isinstance(node, ObjPropSet):
        lines = [f"{pad}OBJ_PROP_SET"]
        for k, sub in node.props:
            lines.append(f"{pad}  prop {k!r}:")
            lines.append(pretty(sub, indent + 2))
        for p, sub in node.patterns:
            lines.append(f"{pad}  pattern /{p}/:")
            lines.append(pretty(sub, indent + 2))
        lines.append(f"{pad}  additional:")
        lines.append(pretty(node.additional, indent + 2))
        return nl.join(lines)
    if isinstance(node, ArrItems):
        lines = [f"{pad}ARR_ITEMS"]
        for i, sub in enumerate(node.positional):
            lines.append(f"{pad}  [{i}]:")
            lines.append(pretty(sub, indent + 2))
        lines.append(f"{pad}  additional:")
        lines.append(pretty(node.additional, indent + 2))
        return nl.join(lines)
    if isinstance(node, ArrContains):
        return f"{pad}ARR_CONTAINS{nl}" + pretty(node.schema, indent + 1)
    if isinstance(node, ItemRange):
        return f"{pad}ITEM_RANGE [{node.lo}, {node.hi}]"
    if isinstance(node, ArrUnique):
        return f"{pad}ARR_UNIQUE"
    if isinstance(node, EnumMatch):
        return f"{pad}ENUM_MATCH {list(node.raw_json)}"
    if isinstance(node, Ref):
        return f"{pad}REF {node.uri}"
    return f"{pad}{node!r}"


def dump_stages(schema, registry=None, base_uri: str = "") -> str:
    """All three compile stages, labeled — the `jvst -d` analogue."""
    from jvst_spark.spec.canonify import canonify
    from jvst_spark.spec.simplify import simplify
    from jvst_spark.spec.translate import translate_with_defs

    root, defs = translate_with_defs(schema, registry, base_uri)
    out = ["==== stage: translated (cnode analogue) ====", pretty(root)]
    for uri, node in sorted(defs.items()):
        out += [f"-- def {uri}:", pretty(node)]
    s = simplify(root)
    sdefs = {u: simplify(n) for u, n in defs.items()}
    out += ["", "==== stage: simplified ====", pretty(s)]
    for uri, node in sorted(sdefs.items()):
        out += [f"-- def {uri}:", pretty(node)]
    c = canonify(s)
    cdefs = {u: canonify(n) for u, n in sdefs.items()}
    out += ["", "==== stage: canonified (the executable DAG) ====", pretty(c)]
    for uri, node in sorted(cdefs.items()):
        out += [f"-- def {uri}:", pretty(node)]
    return "\n".join(out)
