"""Compiled-plan artifacts: save/load a CompiledSpec.

The analogue of jvst's VM-program serialization (jvst_vm_writefile /
jvst_vm_readfile, src/validate_vm.c:257-447): compile once on a dev
machine, ship the artifact with `spark-submit --py-files`, rehydrate on
the driver without re-running translate/simplify/canonify.

Format: versioned JSON of the node DAG (not pickle — auditable, stable
across Python versions, diff-able in review).
"""

from __future__ import annotations

import json
from typing import Dict

from jvst_spark.compiler.plan import CompiledSpec
from jvst_spark.spec import nodes as N

FORMAT_VERSION = 3  # v3: enum canon normalizes -0.0 (NUM_RANGE regime)
# v2: length-prefixed string canonicalization

_LEAF_FIELDS = {
    "Valid": (),
    "Invalid": ("code",),
    "NumRange": ("lo", "hi", "lo_excl", "hi_excl"),
    "NumInteger": (),
    "NumMultipleOf": ("divisor",),
    "StrMatch": ("pattern",),
    "StrLength": ("lo", "hi"),
    "ObjRequired": ("keys",),
    "PropRange": ("lo", "hi"),
    "ItemRange": ("lo", "hi"),
    "ArrUnique": (),
    "EnumMatch": ("canon_values", "raw_json"),
    "Ref": ("uri",),
}


def _to_json(n: N.Node):
    t = type(n).__name__
    if t in _LEAF_FIELDS:
        out = {"t": t}
        for f in _LEAF_FIELDS[t]:
            v = getattr(n, f)
            out[f] = list(v) if isinstance(v, tuple) else v
        return out
    if isinstance(n, N.Switch):
        return {"t": "Switch", "arms": {k: _to_json(v) for k, v in n.arms}}
    if isinstance(n, (N.And, N.Or, N.Xor)):
        return {"t": t, "terms": [_to_json(x) for x in n.terms]}
    if isinstance(n, N.Not):
        return {"t": "Not", "term": _to_json(n.term)}
    if isinstance(n, N.ObjPropSet):
        return {
            "t": "ObjPropSet",
            "props": [[k, _to_json(v)] for k, v in n.props],
            "patterns": [[p, _to_json(v)] for p, v in n.patterns],
            "additional": _to_json(n.additional),
        }
    if isinstance(n, N.ObjPropNames):
        return {"t": "ObjPropNames", "name_schema": _to_json(n.name_schema)}
    if isinstance(n, N.ArrItems):
        return {
            "t": "ArrItems",
            "positional": [_to_json(x) for x in n.positional],
            "additional": _to_json(n.additional),
        }
    if isinstance(n, N.ArrContains):
        return {"t": "ArrContains", "schema": _to_json(n.schema)}
    raise TypeError(f"unserializable node: {n!r}")


def _from_json(d) -> N.Node:
    t = d["t"]
    if t in _LEAF_FIELDS:
        cls = getattr(N, t)
        kwargs = {}
        for f in _LEAF_FIELDS[t]:
            v = d[f]
            kwargs[f] = tuple(v) if isinstance(v, list) else v
        return cls(**kwargs)
    if t == "Switch":
        arms = d["arms"]
        return N.Switch(
            tuple((k, _from_json(arms[k])) for k in N.JSON_TYPES)
        )
    if t in ("And", "Or", "Xor"):
        cls = getattr(N, t)
        return cls(tuple(_from_json(x) for x in d["terms"]))
    if t == "Not":
        return N.Not(_from_json(d["term"]))
    if t == "ObjPropSet":
        return N.ObjPropSet(
            tuple((k, _from_json(v)) for k, v in d["props"]),
            tuple((p, _from_json(v)) for p, v in d["patterns"]),
            _from_json(d["additional"]),
        )
    if t == "ObjPropNames":
        return N.ObjPropNames(_from_json(d["name_schema"]))
    if t == "ArrItems":
        return N.ArrItems(
            tuple(_from_json(x) for x in d["positional"]),
            _from_json(d["additional"]),
        )
    if t == "ArrContains":
        return N.ArrContains(_from_json(d["schema"]))
    raise ValueError(f"unknown node type in artifact: {t}")


def dumps(spec: CompiledSpec) -> str:
    return json.dumps(
        {
            "format": FORMAT_VERSION,
            "root": _to_json(spec.root),
            "defs": {u: _to_json(n) for u, n in spec.defs.items()},
        }
    )


def loads(text: str) -> CompiledSpec:
    d = json.loads(text)
    if d.get("format") != FORMAT_VERSION:
        raise ValueError(f"unsupported artifact format: {d.get('format')}")
    return CompiledSpec(
        _from_json(d["root"]),
        {u: _from_json(n) for u, n in d["defs"].items()},
    )


def save(spec: CompiledSpec, path: str) -> None:
    with open(path, "w") as f:
        f.write(dumps(spec))


def load(path: str) -> CompiledSpec:
    with open(path) as f:
        return loads(f.read())
