"""ECMA-262 `pattern` dialect -> per-engine regex translation.

JSON Schema regexes are ECMA-262; the engine evaluates them on three
backends with three native dialects: Java regex (Column `rlike`),
Python `re` (pyeval / compile-time property matching), RE2 (arrow
backend). Left raw, the same schema can return different verdicts per
backend: Python's `\\d`/`\\w` are unicode-aware, Python and Java match
`$` before a trailing newline, Java treats `[a[b]]` as a nested class
and `&&` as intersection, RE2 rejects backreferences at runtime.

The reference normalizes regex dialects explicitly at parse time
(`struct ast_regexp { enum re_dialect dialect; ... }`,
/root/reference/src/ast.h:21-25) and compiles every pattern to a
libfsm DFA — so backreferences, lookaround, and word boundaries are
unsupported *by construction* there. We mirror that contract:

- parse the ECMA pattern ONCE at schema-compile time;
- REJECT constructs a DFA cannot express or whose semantics diverge
  across engines (backreferences, lookaround, \\b/\\B, \\p{...},
  octal/control escapes, inline flags) with a clear compile-time
  error, exactly where the reference's compiler would fail;
- RENDER an equivalent pattern per target engine with pinned
  semantics:
    \\d \\w \\s (+negations)  -> their ECMA/ASCII class bodies
    ^ $                       -> absolute string start/end (\\A, \\z/\\Z)
    .                         -> ECMA's [^\\n\\r\\u2028\\u2029]
    dangling { } ]            -> escaped literals
    in-class [ & ^            -> escaped (Java nesting/intersection)

Match semantics are SEARCH (unanchored) on every backend, as the
reference implements for `pattern`
(/root/reference/src/validate_constraints.c:5154-5205).
"""

from __future__ import annotations

import functools
import re as _re

TARGETS = ("python", "java", "re2")

_DIGIT_BODY = "0-9"
_WORD_BODY = "0-9A-Za-z_"
# ECMA-262 WhiteSpace + LineTerminator production (the \s class)
_SPACE_CPS = (
    0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x20, 0xA0, 0x1680,
    (0x2000, 0x200A), 0x2028, 0x2029, 0x202F, 0x205F, 0x3000, 0xFEFF,
)

_QUANT_RE = _re.compile(r"\{(\d+)(,(\d*))?\}")
_GROUP_NAME_RE = _re.compile(r"<([A-Za-z_][A-Za-z0-9_]*)>")
_ASCII_PUNCT = set("!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~ ")


class UnsupportedPattern(ValueError):
    """An ECMA-262 construct the engine rejects at compile time —
    either not DFA-expressible (reference parity) or semantically
    divergent across the three execution backends."""


def _uni(cp: int, target: str) -> str:
    if target == "re2":
        return f"\\x{{{cp:x}}}"
    if cp <= 0xFFFF:
        return f"\\u{cp:04x}"
    if target == "python":
        return f"\\U{cp:08x}"
    return f"\\x{{{cp:x}}}"  # java


def _space_body(target: str) -> str:
    parts = []
    for item in _SPACE_CPS:
        if isinstance(item, tuple):
            parts.append(f"{_uni(item[0], target)}-{_uni(item[1], target)}")
        elif item == 0x20:
            parts.append(" ")
        else:
            parts.append(_uni(item, target))
    return "".join(parts)


def _dot(target: str) -> str:
    return (
        "[^\\n\\r" + _uni(0x2028, target) + _uni(0x2029, target) + "]"
    )


def _literal(ch: str, target: str, in_class: bool = False) -> str:
    cp = ord(ch)
    if cp < 0x20 or cp == 0x7F or cp > 0x7F:
        # control or non-ASCII: render as an escape so the byte-level
        # pattern is unambiguous in every engine
        if cp == 0x09:
            return "\\t"
        if cp == 0x0A:
            return "\\n"
        if cp == 0x0D:
            return "\\r"
        return _uni(cp, target)
    return ch


def _escape(pattern: str, i: int, target: str, in_class: bool):
    """Handle a backslash escape starting at pattern[i] == '\\\\'.
    Returns (rendered, next_index, codepoint) — codepoint is None for
    class-body expansions (\\d/\\w/\\s), the matched char otherwise."""
    n = len(pattern)
    if i + 1 >= n:
        raise UnsupportedPattern("trailing backslash")
    e = pattern[i + 1]
    if e == "d":
        return (_DIGIT_BODY if in_class else f"[{_DIGIT_BODY}]"), i + 2, None
    if e == "w":
        return (_WORD_BODY if in_class else f"[{_WORD_BODY}]"), i + 2, None
    if e == "s":
        body = _space_body(target)
        return (body if in_class else f"[{body}]"), i + 2, None
    if e in ("D", "W", "S"):
        if in_class:
            raise UnsupportedPattern(
                f"negated class escape \\{e} inside a character class"
            )
        body = {
            "D": _DIGIT_BODY, "W": _WORD_BODY, "S": _space_body(target)
        }[e]
        return f"[^{body}]", i + 2, None
    if e in ("n", "r", "t", "f"):
        cp = {"n": 0x0A, "r": 0x0D, "t": 0x09, "f": 0x0C}[e]
        return "\\" + e, i + 2, cp
    if e == "v":
        # Java's \v is a vertical-whitespace CLASS; pin to U+000B
        return "\\x0b", i + 2, 0x0B
    if e == "0":
        if i + 2 < n and pattern[i + 2].isdigit():
            raise UnsupportedPattern("octal escape")
        return "\\x00", i + 2, 0
    if e == "x":
        hh = pattern[i + 2 : i + 4]
        if len(hh) != 2 or any(c not in "0123456789abcdefABCDEF" for c in hh):
            raise UnsupportedPattern("\\x needs two hex digits")
        return "\\x" + hh.lower(), i + 4, int(hh, 16)
    if e == "u":
        hhhh = pattern[i + 2 : i + 6]
        if len(hhhh) != 4 or any(
            c not in "0123456789abcdefABCDEF" for c in hhhh
        ):
            raise UnsupportedPattern("\\u needs four hex digits")
        cp = int(hhhh, 16)
        j = i + 6
        if 0xD800 <= cp <= 0xDBFF:
            # UTF-16 surrogate pair: ECMA patterns address astral chars
            # as two \u escapes; Python regexes are code-point based,
            # so the pair must combine into one astral escape or the
            # backends diverge silently
            lo_hex = pattern[j + 2 : j + 6] if pattern[j : j + 2] == "\\u" else ""
            if len(lo_hex) == 4 and all(
                c in "0123456789abcdefABCDEF" for c in lo_hex
            ):
                lo = int(lo_hex, 16)
                if 0xDC00 <= lo <= 0xDFFF:
                    cp = 0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00)
                    return _uni(cp, target), j + 6, cp
            raise UnsupportedPattern(
                f"lone high surrogate \\u{cp:04x} (not a code point)"
            )
        if 0xDC00 <= cp <= 0xDFFF:
            raise UnsupportedPattern(
                f"lone low surrogate \\u{cp:04x} (not a code point)"
            )
        return _uni(cp, target), j, cp
    if e in "123456789":
        raise UnsupportedPattern(
            f"backreference \\{e}: not DFA-expressible (the reference "
            "compiles patterns to libfsm DFAs, src/ast.h:21-25)"
        )
    if e == "b":
        if in_class:
            return "\\x08", i + 2, 0x08  # backspace inside a class
        raise UnsupportedPattern(
            "word boundary \\b: not DFA-expressible and unicode-divergent"
        )
    if e == "B":
        raise UnsupportedPattern("word boundary \\B: not DFA-expressible")
    if e in ("p", "P"):
        raise UnsupportedPattern(
            "unicode property escapes \\p{...} differ across engines"
        )
    if e == "k":
        raise UnsupportedPattern("named backreference \\k<...>")
    if e == "c":
        raise UnsupportedPattern("control escape \\cX")
    if e == "A" or e == "z" or e == "Z" or e == "G":
        raise UnsupportedPattern(f"non-ECMA anchor escape \\{e}")
    if e.isalnum():
        raise UnsupportedPattern(f"unknown escape \\{e}")
    if e in _ASCII_PUNCT:
        return "\\" + e, i + 2, ord(e)
    # identity escape of a non-ASCII char: render the char itself
    return _literal(e, target, in_class), i + 2, ord(e)


def _class_atom(pattern: str, j: int, target: str):
    """One class item -> (kind, rendered, cp, next_j); kind is 'char'
    (cp set) or 'body' (a \\d/\\w/\\s expansion, cp None)."""
    c = pattern[j]
    if c == "\\":
        rendered, j2, cp = _escape(pattern, j, target, in_class=True)
        return ("body" if cp is None else "char"), rendered, cp, j2
    if c in "[&^-":
        # escape what some engine treats specially inside a class
        # (Java nesting/intersection; dash handled by the range logic)
        return "char", "\\" + c, ord(c), j + 1
    return "char", _literal(c, target, in_class=True), ord(c), j + 1


def _char_class(pattern: str, i: int, target: str):
    """Parse a [...] class starting at pattern[i] == '[' item by item,
    so ranges are validated at compile time and shorthand expansions
    can never glue onto a neighboring '-' to form an unintended or
    invalid range ([\\w-.] must stay literal-dash, [a-\\d] too)."""
    n = len(pattern)
    j = i + 1
    neg = False
    if j < n and pattern[j] == "^":
        neg = True
        j += 1
    if j < n and pattern[j] == "]":
        # covers [], [^] and leading-']' — all three diverge across
        # engines (ECMA empty class vs literal-] elsewhere)
        raise UnsupportedPattern(
            "']' at the start of a character class (escape it as \\])"
        )
    body = []
    closed = False
    while j < n:
        if pattern[j] == "]":
            closed = True
            j += 1
            break
        kind, rend, cp, j = _class_atom(pattern, j, target)
        # range? a '-' NOT followed by ']' binds the next atom
        if (
            j < n
            and pattern[j] == "-"
            and j + 1 < n
            and pattern[j + 1] != "]"
        ):
            if kind != "char":
                # ECMA Annex B: '-' after a class escape is a literal
                body.append(rend)
                body.append("\\-")
                j += 1
                continue
            kind2, rend2, cp2, j2 = _class_atom(pattern, j + 1, target)
            j = j2
            if kind2 != "char":
                body.append(rend)
                body.append("\\-")
                body.append(rend2)
                continue
            if cp2 < cp:
                raise UnsupportedPattern(
                    f"reversed class range (U+{cp:04X}-U+{cp2:04X})"
                )
            body.append(f"{rend}-{rend2}")
            continue
        body.append(rend)
    if not closed:
        raise UnsupportedPattern("unterminated character class")
    return "[" + ("^" if neg else "") + "".join(body) + "]", j


def _group_open(pattern: str, i: int, target: str):
    """Parse a group opener at pattern[i] == '('."""
    n = len(pattern)
    if i + 1 >= n or pattern[i + 1] != "?":
        return "(", i + 1
    if i + 2 >= n:
        raise UnsupportedPattern("dangling '(?'")
    c = pattern[i + 2]
    if c == ":":
        return "(?:", i + 3
    if c in "=!":
        raise UnsupportedPattern("lookahead (?=/(?!): not DFA-expressible")
    if c == "<":
        if i + 3 < n and pattern[i + 3] in "=!":
            raise UnsupportedPattern(
                "lookbehind (?<=/(?<!: not DFA-expressible"
            )
        m = _GROUP_NAME_RE.match(pattern, i + 2)
        if not m:
            raise UnsupportedPattern("malformed group name")
        # group NAMES are semantically inert here (backreferences are
        # rejected), and the engines disagree on allowed name chars
        # (Java forbids '_') — render as a plain non-capturing group
        return "(?:", m.end()
    raise UnsupportedPattern(f"unsupported group (?{c} (inline flags?)")


@functools.lru_cache(maxsize=4096)
def translate(pattern: str, target: str) -> str:
    """ECMA-262 pattern -> `target` dialect ('python'|'java'|'re2').
    Raises UnsupportedPattern at compile time for rejected constructs."""
    if target not in TARGETS:
        raise ValueError(f"unknown regex target: {target}")
    out = []
    i, n = 0, len(pattern)
    can_quant = False  # a quantifier may follow the last emitted token
    depth = 0
    while i < n:
        c = pattern[i]
        if c == "\\":
            rendered, i, _cp = _escape(pattern, i, target, in_class=False)
            out.append(rendered)
            can_quant = True
        elif c == "^":
            out.append("\\A")
            i += 1
            can_quant = False
        elif c == "$":
            out.append("\\Z" if target == "python" else "\\z")
            i += 1
            can_quant = False
        elif c == ".":
            out.append(_dot(target))
            i += 1
            can_quant = True
        elif c == "[":
            rendered, i = _char_class(pattern, i, target)
            out.append(rendered)
            can_quant = True
        elif c == "(":
            rendered, i = _group_open(pattern, i, target)
            out.append(rendered)
            depth += 1
            can_quant = False
        elif c == ")":
            depth -= 1
            if depth < 0:
                raise UnsupportedPattern("unbalanced ')'")
            out.append(")")
            i += 1
            can_quant = True
        elif c == "|":
            out.append("|")
            i += 1
            can_quant = False
        elif c in "*+?":
            if not can_quant:
                raise UnsupportedPattern(
                    f"quantifier '{c}' with nothing to repeat (pos {i})"
                )
            out.append(c)
            i += 1
            if i < n and pattern[i] == "?":  # lazy modifier
                out.append("?")
                i += 1
            can_quant = False
        elif c == "{":
            m = _QUANT_RE.match(pattern, i)
            if m:
                if not can_quant:
                    raise UnsupportedPattern(
                        "quantifier {..} with nothing to repeat"
                    )
                lo = int(m.group(1))
                hi = m.group(3)
                if m.group(2) and hi and int(hi) < lo:
                    raise UnsupportedPattern("reversed {m,n} quantifier")
                out.append(m.group(0))
                i = m.end()
                if i < n and pattern[i] == "?":
                    out.append("?")
                    i += 1
                can_quant = False
            else:
                out.append("\\{")  # dangling '{' is a literal in ECMA
                i += 1
                can_quant = True
        elif c in "}]":
            out.append("\\" + c)
            i += 1
            can_quant = True
        else:
            out.append(_literal(c, target))
            i += 1
            can_quant = True
    if depth != 0:
        raise UnsupportedPattern("unbalanced '('")
    return "".join(out)


def validate(pattern: str) -> None:
    """Raise UnsupportedPattern if `pattern` uses rejected constructs
    (run at schema-compile time, like the reference's re parser)."""
    translate(pattern, "python")


@functools.lru_cache(maxsize=4096)
def compile_python(pattern: str):
    """Compiled Python regex with pinned ECMA semantics."""
    return _re.compile(translate(pattern, "python"))


def search(pattern: str, s: str) -> bool:
    """Unanchored ECMA search via the Python engine (compile-time
    property-name matching and pyeval share this)."""
    return compile_python(pattern).search(s) is not None
