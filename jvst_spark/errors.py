"""Violation-code vocabulary.

Mirrors the reference validator's error enum so violation rows carry the
same numeric codes (reference: enum jvst_invalid_code,
src/validate_ir.h:134-163; messages src/validate_ir.c jvst_invalid_msg).
Engine-specific table-level extensions start at 0x0100 (the reference is
single-document scoped and has no table-level checks).
"""

from __future__ import annotations

# --- jvst-compatible per-document codes (src/validate_ir.h:134-163) ---
INVALID_UNEXPECTED_TOKEN = 0x0001  # type mismatch
INVALID_NOT_INTEGER = 0x0002
INVALID_NUMBER = 0x0003
INVALID_TOO_FEW_PROPS = 0x0004
INVALID_TOO_MANY_PROPS = 0x0005
INVALID_MISSING_REQUIRED_PROPERTIES = 0x0006
INVALID_SPLIT_CONDITION = 0x0007  # combinator (allOf/anyOf/oneOf/not) failed
INVALID_BAD_PROPERTY_NAME = 0x0008
INVALID_MATCH_CASE = 0x0009  # pattern / property-pattern mismatch
INVALID_STRING = 0x000A
INVALID_LENGTH_TOO_SHORT = 0x000B
INVALID_LENGTH_TOO_LONG = 0x000C
INVALID_ARRAY = 0x000D
INVALID_TOO_FEW_ITEMS = 0x000E
INVALID_TOO_MANY_ITEMS = 0x000F
INVALID_UNSATISFIED_CONTAINS = 0x0010
INVALID_NOT_MULTIPLE = 0x0011
INVALID_NOT_UNIQUE = 0x0012
INVALID_JSON = 0x0020

# --- engine extensions: table-level checks (not in the reference) ---
INVALID_DUPLICATE_KEY = 0x0100       # table-level uniqueness violation
INVALID_DANGLING_REF = 0x0101        # referential-integrity violation
INVALID_DISTRIBUTION_DRIFT = 0x0102  # KS/PSI drift gate violation

# message strings byte-match the reference's jvst_invalid_msg
# (src/validate_ir.c:70-135) — the span-sequence-equality invariant
# requires violation rows to round-trip byte-identically
_MESSAGES = {
    INVALID_UNEXPECTED_TOKEN: "unexpected token",
    INVALID_NOT_INTEGER: "number is not an integer",
    INVALID_NUMBER: "number not valid",
    INVALID_TOO_FEW_PROPS: "too few properties",
    INVALID_TOO_MANY_PROPS: "too many properties",
    INVALID_MISSING_REQUIRED_PROPERTIES: "missing required properties",
    INVALID_SPLIT_CONDITION: "invalid split condition",
    INVALID_BAD_PROPERTY_NAME: "bad property name",
    INVALID_MATCH_CASE: "invalid match case (internal error)",
    INVALID_STRING: "invalid string",
    INVALID_LENGTH_TOO_SHORT: "length is too short",
    INVALID_LENGTH_TOO_LONG: "length is too long",
    INVALID_ARRAY: "array is invalid",
    INVALID_TOO_FEW_ITEMS: "array has too few items",
    INVALID_TOO_MANY_ITEMS: "array has too many items",
    INVALID_UNSATISFIED_CONTAINS: "contains constraint is not satisfied",
    INVALID_NOT_MULTIPLE: "number is not an integer multiple",
    INVALID_NOT_UNIQUE: "array elements are not unique",
    INVALID_JSON: "encountered invalid JSON",
    # engine extensions (no reference analogue)
    INVALID_DUPLICATE_KEY: "duplicate key across table",
    INVALID_DANGLING_REF: "dangling reference (no match in dimension)",
    INVALID_DISTRIBUTION_DRIFT: "distribution drift beyond threshold",
}


def invalid_msg(code: int) -> str:
    """Byte-identical to jvst_invalid_msg (src/validate_ir.c:70-135)."""
    return _MESSAGES.get(code, "Unknown error")
