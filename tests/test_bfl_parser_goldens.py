"""Parser AST golden table — direct shape-equality port of the
reference's ``server/lib/parser_test.go`` (VERDICT r12 #4).

The eval corpus (tests/corpus.py) pins SEMANTICS; these rows pin the
GRAMMAR SHAPE itself, so a parser refactor that re-associates
precedence while keeping the corpus green is now observable.

Mapping from the reference's participle structs to ``bfl/ast.py``'s
normalized nodes (documented in ast.py's module docstring):

* ``Expression > Logical > Equality > Comparison > Unary > Primary``
  layers with ``Op``/``Next`` right-recursion → ``BinaryOp(op, left,
  right)`` with the SAME right-associative grouping (``a and b and c``
  = ``and(a, and(b, c))``) — asserted verbatim below.
* ``CallExpression{Identifier: "a.b"}`` (participle's ident regex eats
  dots and embedded ``.*``) → ``Path(outer=[Field/Wildcard …])``
  segment list; ``request.path.*.x`` (one identifier string in the
  reference, ``parser_test.go:1161-1190``) and ``request.path[*].x``
  (identifier + Key "*" select, ``:1192-1241``) normalize to the SAME
  segment list — the equivalence the reference's ojg eval applies.
* ``SelectExpression{Index/Key}`` → ``Index``/``Key`` segments;
  a chained ``SelectExpression.Expression`` whose head is a
  ``CallExpression`` with Parameters (``…["user-agent"]
  .startsWith("kube-probe")``, ``:661-749``) → the helper folds into
  ``Path.helper``/``Path.args`` (the reference folds it the same way
  at Precompute, ``precompute.go:102-111``).
* ``Parameters: []*Parameter{{Tag: "description", Expression: …}}``
  (tagged ``rule()`` params, ``:751-1160``) → the tag parses and is
  DISCARDED, the expression is kept in order (``parser.py:352-364``;
  ``rule`` is grammar-only and collapses at eval, eval.go:641-644).
* ``Primary{Bool: &true}`` / ``Primary{}`` (participle only captures
  the ``true`` token; ``false`` leaves an empty Primary,
  ``parser_test.go:58-96``) → ``BoolLit(True)`` / ``BoolLit(False)``
  — the normalization is semantic-preserving (empty Primary is falsy).
* String/regex literals are stored UNQUOTED here (the reference keeps
  the quotes in the AST and unquotes at eval).
"""

from basenine_spark.bfl.ast import (
    BinaryOp,
    BoolLit,
    Field,
    Index,
    Key,
    NumberLit,
    Path,
    RegexLit,
    StringLit,
    SubExpression,
    Unary,
    Wildcard,
)
from basenine_spark.bfl.parser import BFLSyntaxError, parse

import pytest


def P(*segs, helper=None, args=None):
    """Shorthand: a plain Path over dotted Field names, with optional
    bracket segments and trailing helper."""
    out = []
    for s in segs:
        if isinstance(s, str):
            out.extend(Field(n) for n in s.split("."))
        else:
            out.append(s)
    return Path(outer=out, helper=helper, args=list(args or []))


def test_basic_boolean():
    # parser_test.go:9-56  `http or !amqp`
    assert parse("http or !amqp").expr == BinaryOp(
        "or", P("http"), Unary("!", P("amqp"))
    )


def test_boolean_literals():
    # parser_test.go:58-96  `true and false`
    assert parse("true and false").expr == BinaryOp(
        "and", BoolLit(True), BoolLit(False)
    )


def test_compound_boolean():
    # parser_test.go:97-151  `true and 5 == a`
    assert parse("true and 5 == a").expr == BinaryOp(
        "and", BoolLit(True), BinaryOp("==", NumberLit(5.0), P("a"))
    )


def test_negated_compound_boolean():
    # parser_test.go:152-221  `true and !(5 == a)`
    assert parse("true and !(5 == a)").expr == BinaryOp(
        "and",
        BoolLit(True),
        Unary(
            "!", SubExpression(BinaryOp("==", NumberLit(5.0), P("a")))
        ),
    )


def test_sub_expression():
    # parser_test.go:222-311  `(a.b == "hello") and (x.y > 3.14)`
    assert parse('(a.b == "hello") and (x.y > 3.14)').expr == BinaryOp(
        "and",
        SubExpression(BinaryOp("==", P("a.b"), StringLit("hello"))),
        SubExpression(BinaryOp(">", P("x.y"), NumberLit(3.14))),
    )


def test_regex_literal():
    # parser_test.go:312-353  `request == r"hello.*"`
    assert parse('request == r"hello.*"').expr == BinaryOp(
        "==", P("request"), RegexLit("hello.*")
    )


def test_complex_query_right_associative_and_chain():
    # parser_test.go:354-499 — the four-term and-chain groups
    # RIGHT-recursively (participle's Next chain): and(http,
    # and(method, and(path, (sub))))
    text = (
        'http and request.method == "GET" and request.path == '
        '"/example" and (request.query.a == "b" or '
        'request.headers.x == "y")'
    )
    assert parse(text).expr == BinaryOp(
        "and",
        P("http"),
        BinaryOp(
            "and",
            BinaryOp("==", P("request.method"), StringLit("GET")),
            BinaryOp(
                "and",
                BinaryOp("==", P("request.path"), StringLit("/example")),
                SubExpression(
                    BinaryOp(
                        "or",
                        BinaryOp(
                            "==", P("request.query.a"), StringLit("b")
                        ),
                        BinaryOp(
                            "==", P("request.headers.x"), StringLit("y")
                        ),
                    )
                ),
            ),
        ),
    )


def test_select_expression_index():
    # parser_test.go:501-546  `request.path[1] == "hello"`
    assert parse('request.path[1] == "hello"').expr == BinaryOp(
        "==", P("request.path", Index(1)), StringLit("hello")
    )


def test_select_expression_key():
    # parser_test.go:547-595 — `!` binds the PATH, == applies to the
    # negation (Unary sits under Comparison in the layer stack)
    assert parse(
        '!request.headers["user-agent"] == "kube-probe"'
    ).expr == BinaryOp(
        "==",
        Unary("!", P("request.headers", Key("user-agent"))),
        StringLit("kube-probe"),
    )


def test_function_call():
    # parser_test.go:596-659  `a.b(3, 5)` — Identifier "a.b" +
    # Parameters; normalized: last segment becomes the helper
    assert parse("a.b(3, 5)").expr == P(
        "a", helper="b", args=[NumberLit(3.0), NumberLit(5.0)]
    )


def test_select_expression_chain_function():
    # parser_test.go:661-749
    assert parse(
        '!http or !request.headers["user-agent"]'
        '.startsWith("kube-probe")'
    ).expr == BinaryOp(
        "or",
        Unary("!", P("http")),
        Unary(
            "!",
            P(
                "request.headers",
                Key("user-agent"),
                helper="startsWith",
                args=[StringLit("kube-probe")],
            ),
        ),
    )


def test_wildcard_in_identifier():
    # parser_test.go:1161-1190 — the reference keeps
    # `request.path.*.x` as ONE identifier string; we normalize to
    # the segment list its eval resolves it to
    assert parse("request.path.*.x").expr == P(
        "request.path", Wildcard(), Field("x")
    )


def test_wildcard_index_select():
    # parser_test.go:1192-1241 — `request.path[*].x` is identifier +
    # Key("*") select + chained expression in the reference; both
    # spellings normalize to the same Path
    assert parse("request.path[*].x").expr == P(
        "request.path", Wildcard(), Field("x")
    )
    assert parse("request.path[*].x").expr == parse(
        "request.path.*.x"
    ).expr


def test_rules_assertion_tagged_params():
    # parser_test.go:751-1160 — three and-chained rule() calls with
    # tagged parameters (description:/query:/assert:). Tags parse and
    # are discarded; the three expressions arrive in source order as
    # the helper args. NOTE the embedded `\\d` stays double-escaped in
    # the source text (Go backtick string), so after our parse-time
    # unquote the pattern carries a single backslash each.
    text = r"""
rule(
    description: "Holy in name property",
    query: http and service == r"catalogue.*" and request.path == r"catalogue.*" and response.headers["content-type"].contains("application/json"),
    assert: response.body.name == "Holy"
)
and
rule(
    description: "Content Length header",
    query: http,
    assert: response.headers["content-length"] == r"(\\d+(?:\\.\\d+)?)"
)
and
rule(
    description: "Latency test",
    query: http and service == r"carts.*",
    assert: response.elapsedTime >= 1
)
"""
    rule1 = Path(
        outer=[],
        helper="rule",
        args=[
            StringLit("Holy in name property"),
            BinaryOp(
                "and",
                P("http"),
                BinaryOp(
                    "and",
                    BinaryOp(
                        "==", P("service"), RegexLit("catalogue.*")
                    ),
                    BinaryOp(
                        "and",
                        BinaryOp(
                            "==",
                            P("request.path"),
                            RegexLit("catalogue.*"),
                        ),
                        P(
                            "response.headers",
                            Key("content-type"),
                            helper="contains",
                            args=[StringLit("application/json")],
                        ),
                    ),
                ),
            ),
            BinaryOp(
                "==", P("response.body.name"), StringLit("Holy")
            ),
        ],
    )
    rule2 = Path(
        outer=[],
        helper="rule",
        args=[
            StringLit("Content Length header"),
            P("http"),
            BinaryOp(
                "==",
                P("response.headers", Key("content-length")),
                RegexLit(r"(\d+(?:\.\d+)?)"),
            ),
        ],
    )
    rule3 = Path(
        outer=[],
        helper="rule",
        args=[
            StringLit("Latency test"),
            BinaryOp(
                "and",
                P("http"),
                BinaryOp("==", P("service"), RegexLit("carts.*")),
            ),
            BinaryOp(">=", P("response.elapsedTime"), NumberLit(1.0)),
        ],
    )
    assert parse(text).expr == BinaryOp(
        "and", rule1, BinaryOp("and", rule2, rule3)
    )


def test_syntax_error_literal_not_terminated():
    # parser_test.go:1243-1249 — exact golden string incl. line:col
    # (the reference wraps the text in leading \n + trailing \n\t)
    with pytest.raises(BFLSyntaxError) as ei:
        parse('\n=.="\n\t')
    assert str(ei.value) == "2:5: literal not terminated"


def test_syntax_error_unexpected_token():
    # parser_test.go:1251-1256
    with pytest.raises(BFLSyntaxError) as ei:
        parse('\nrequest.path[3.14] == "hello"\n\t')
    assert str(ei.value) == (
        '2:14: unexpected token "3.14" (expected (<string> | <char> '
        '| <rawstring> | "*") "]")'
    )
