"""AST for BFL (Basenine Filter Language).

Grammar parity target: the participle grammar in the reference
(``server/lib/parser.go:15-75``).  Precedence layers mirror the reference
exactly: Expression > Logical > Equality > Comparison > Unary > Primary.
All operators are *right-recursive* (``a == b == c`` groups as
``a == (b == c)``), matching participle's recursive struct layout.

Unlike the reference (which annotates the participle AST in-place during
``Precompute``), we parse directly into a normalized form: every
dotted/bracketed/wildcard/recursive-descent access is a single ``Path``
node holding a segment list, an optional document re-parse function
(``json()`` / ``xml()``, see ``server/lib/eval.go:358-404``) and an
optional trailing scalar helper (``server/lib/eval.go:545-562``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Union


# ---------------------------------------------------------------------------
# Path segments
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Field:
    """``.name`` — child key access (reference: ojg ``Child`` fragment)."""

    name: str


@dataclass(frozen=True)
class Index:
    """``[0]`` — 0-based array index (reference: ``parser.go:63``)."""

    index: int


@dataclass(frozen=True)
class Key:
    """``["some-key"]`` — bracketed key, allows non-identifier chars
    (reference: ``parser.go:64``)."""

    key: str


@dataclass(frozen=True)
class Wildcard:
    """``.*`` or ``[*]`` — fan out to all elements/values
    (reference: ``parser.go:57,64``)."""


@dataclass(frozen=True)
class RecursiveDescent:
    """``..name`` — match key at any depth (reference: ``parser.go:65``)."""

    name: str


Segment = Union[Field, Index, Key, Wildcard, RecursiveDescent]


# ---------------------------------------------------------------------------
# Expression nodes
# ---------------------------------------------------------------------------


@dataclass
class NumberLit:
    value: float  # all numeric literals are float64 (parser.go:44)


@dataclass
class StringLit:
    value: str


@dataclass
class RegexLit:
    pattern: str  # r"..." literal; only meaningful as ==/!= operand


@dataclass
class BoolLit:
    value: bool


@dataclass
class NilLit:
    pass


@dataclass
class Path:
    """A document access, possibly through ``json()``/``xml()`` and/or
    ending in a scalar helper call.

    ``outer``  — segments before ``json()``/``xml()`` (or the whole path).
    ``docfunc`` — ``"json"`` | ``"xml"`` | None.
    ``inner``  — segments applied to the re-parsed sub-document.
    ``helper`` — trailing helper name (``startsWith`` …) or a bare helper
                 (``now``, ``limit``, ``redact``, ``datetime`` have empty
                 ``outer``).  None when the path is a plain lookup.
    ``args``   — helper argument expressions (evaluated as literals; the
                 reference never resolves paths inside helper args, see
                 ``eval.go:565-578`` + ``precompute.go`` which only computes
                 top-level call expressions).
    ``empty_call`` — ``path.helperName()`` with *zero* args parses, in the
                 reference, as a *plain path* ending in the helper name
                 (participle leaves ``Parameters == nil``), which then
                 collapses at eval.  We keep the flag for parity
                 (``eval_test.go:100-103``), except json/xml/now which are
                 special-cased (``precompute.go:67-75,180-185``).
    """

    outer: list = field(default_factory=list)
    docfunc: Optional[str] = None
    inner: list = field(default_factory=list)
    helper: Optional[str] = None
    args: list = field(default_factory=list)


@dataclass
class Unary:
    op: str  # '!' or '-'
    operand: "Expr"


@dataclass
class BinaryOp:
    """and/or/==/!=/>/<>=/<= — layered by the parser, one class here."""

    op: str
    left: "Expr"
    right: "Expr"


@dataclass
class SubExpression:
    expr: "Expr"


Expr = Union[
    NumberLit,
    StringLit,
    RegexLit,
    BoolLit,
    NilLit,
    Path,
    Unary,
    BinaryOp,
    SubExpression,
]


@dataclass
class Query:
    """Root node. ``expr is None`` ⇔ empty query ⇔ match-all
    (reference: ``parser.go:84-86``, ``eval.go:782-785``)."""

    expr: Optional[Expr]
    text: str = ""
    # Extracted by precompute: limit(N) pulled out of the predicate
    # (reference: precompute.go:153-155).
    limit: int = 0


HELPERS = {
    "startsWith",
    "endsWith",
    "contains",
    "datetime",
    "limit",
    "json",
    "xml",
    "redact",
    "now",
    "seconds",
    "minutes",
    "hours",
    "days",
    "weeks",
    "months",
    "years",
}

TIME_HELPERS = {
    # helper -> milliseconds per unit (reference precompute.go:156-176:
    # week=7d, month=30d, year=365d — fixed approximations, NOT calendar).
    "seconds": 1_000,
    "minutes": 60_000,
    "hours": 3_600_000,
    "days": 86_400_000,
    "weeks": 7 * 86_400_000,
    "months": 30 * 86_400_000,
    "years": 365 * 86_400_000,
}
