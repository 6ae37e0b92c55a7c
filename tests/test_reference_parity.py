"""Byte-parity checks against the reference validator's sources.

Skipped when /root/reference is absent (the reference is read-only
study material; these tests pin our outputs to its exact strings)."""

import os
import re

import pytest

from jvst_spark import errors as E

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


def _reference_messages():
    """Parse jvst_invalid_msg's switch (src/validate_ir.c:70-135)."""
    src = open(os.path.join(REF, "src", "validate_ir.c")).read()
    body = src.split("jvst_invalid_msg(enum jvst_invalid_code code)")[1]
    body = body.split("\n}\n")[0]
    out = {}
    for case, msg in re.findall(
        r"case JVST_INVALID_(\w+):\s*return \"([^\"]*)\";", body
    ):
        out[case] = msg
    return out


def _reference_codes():
    """Parse enum jvst_invalid_code (src/validate_ir.h:134-163)."""
    src = open(os.path.join(REF, "src", "validate_ir.h")).read()
    body = src.split("enum jvst_invalid_code {")[1].split("};")[0]
    out = {}
    for name, val in re.findall(r"JVST_INVALID_(\w+)\s*=\s*(0x[0-9A-Fa-f]+)", body):
        out[name] = int(val, 16)
    return out


def test_violation_codes_match_reference():
    ref = _reference_codes()
    for name, val in ref.items():
        if name.startswith("VM_"):
            continue  # interpreter-internal codes: no analogue
        ours = getattr(E, f"INVALID_{name}", None)
        assert ours == val, f"INVALID_{name}: ours={ours} ref={val}"


def test_violation_messages_match_reference():
    ref_msgs = _reference_messages()
    ref_codes = _reference_codes()
    for name, msg in ref_msgs.items():
        if name.startswith("VM_"):
            continue
        code = ref_codes[name]
        assert E.invalid_msg(code) == msg, (
            f"{name}: ours={E.invalid_msg(code)!r} ref={msg!r}"
        )


def test_unknown_code_message_matches():
    assert E.invalid_msg(0x7FFF) == "Unknown error"
