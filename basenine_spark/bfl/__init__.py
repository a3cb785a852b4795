"""BFL (Basenine Filter Language) front-end: parser, macros, evaluators.

Pipeline (mirrors reference PrepareQuery, ``native.go:345-367``):
``expand_macros`` → ``parse`` → (compile to Spark Column | pyeval).
"""

from .ast import Query
from .macros import add_macro, expand_macros
from .parser import BFLSyntaxError, parse, validate
from .pyeval import eval_obj, eval_query

__all__ = [
    "Query",
    "parse",
    "validate",
    "BFLSyntaxError",
    "add_macro",
    "expand_macros",
    "eval_query",
    "eval_obj",
    "prepare_query",
]


def prepare_query(query: str, macros: dict | None = None) -> Query:
    """Macro-expand + parse (reference ``PrepareQuery`` without the
    storage coupling)."""
    if macros:
        query = expand_macros(macros, query)
    return parse(query)
