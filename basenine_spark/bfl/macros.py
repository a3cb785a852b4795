"""Macro registry + expansion (query-rewrite operator R1).

Parity target: ``/root/reference/server/lib/macro.go``:

* ``AddMacro`` wraps the expansion in parentheses (``macro.go:16-19``).
* ``ExpandMacros`` replaces longest macro names first and uses the
  lookahead ``(?=(?:[^"]|"[^"]*")*$)`` so occurrences inside *string
  literals* are left untouched (``macro.go:24-49``; golden:
  ``macro_test.go:9-31``).
"""

from __future__ import annotations

import re
from typing import Dict


def add_macro(macros: Dict[str, str], macro: str, expanded: str) -> Dict[str, str]:
    macros[macro] = f"({expanded})"
    return macros


def expand_macros(macros: Dict[str, str], query: str) -> str:
    # Longest-first so that overlapping names expand deterministically.
    # NOTE: like the reference, the macro name is used as a raw regex
    # fragment (macro.go:42) — not escaped.
    for macro in sorted(macros, key=len, reverse=True):
        pattern = re.compile(f'({macro})(?=(?:[^"]|"[^"]*")*$)')
        query = pattern.sub(macros[macro].replace("\\", "\\\\"), query)
    return query
