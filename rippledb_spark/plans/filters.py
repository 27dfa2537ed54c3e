"""SPARQL FILTER expressions (engine-tier superset, W3C SPARQL 1.1 §17).

The reference's query surface has no FILTER (src/rdf/query.rs:27-63 is
conjunctive BGP only), and the engine's builder answer so far was "call
``.filter`` on the returned DataFrame" (the bgp_filter_name_pattern query).
That works for the library surface but not the text frontend — a query
STRING with ``FILTER(...)`` had to be rewritten by hand. This module closes
that gap with a small expression AST + parser + Column lowering covering
the comparison/regex subset:

    expr    := or
    or      := and ('||' and)*
    and     := unary ('&&' unary)*
    unary   := '!' unary | primary
    primary := '(' expr ')'
             | REGEX(?var, "pattern" [, "flags"])   -- partial match, rlike
             | BOUND(?var)                          -- OPTIONAL null probe
             | operand cmp operand                  -- cmp ∈ = != < > <= >=
    operand := ?var | "string" | number | bare-word (resolved as a term)

Typing rule (the engine stores all node values as strings): a comparison
with a NUMERIC literal operand casts the other side to double — a value
that does not parse as a number yields NULL, and Spark's filter drops
NULL rows, which matches SPARQL's type-error semantics (an erroring FILTER
eliminates the solution, §17.2). All-string comparisons are lexicographic
(codepoint string order, the engine-wide convention). ``REGEX`` lowers to
``rlike`` (both are partial-match); only the ``i`` flag is supported.

Scale shape: lowering produces ordinary Catalyst predicates over the
bound-variable columns, so FILTER costs nothing beyond the comparison —
pushed through joins / into scans exactly like a hand-written
``DataFrame.filter`` (see bgp_filter_name_pattern's plan).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column

from rippledb_spark.errors import QueryError


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class FVar:
    name: str  # without the leading '?'/'$'


@dataclass(frozen=True)
class FStr:
    value: str


@dataclass(frozen=True)
class FNum:
    value: float


@dataclass(frozen=True)
class FCmp:
    op: str  # '=', '!=', '<', '>', '<=', '>='
    left: "FOperand"
    right: "FOperand"


@dataclass(frozen=True)
class FRegex:
    var: FVar
    pattern: str
    flags: str = ""


@dataclass(frozen=True)
class FBound:
    var: FVar


@dataclass(frozen=True)
class FNot:
    inner: "FilterExpr"


@dataclass(frozen=True)
class FAnd:
    left: "FilterExpr"
    right: "FilterExpr"


@dataclass(frozen=True)
class FOr:
    left: "FilterExpr"
    right: "FilterExpr"


FOperand = FVar | FStr | FNum
FilterExpr = FCmp | FRegex | FBound | FNot | FAnd | FOr

_CMP_OPS = ("<=", ">=", "!=", "=", "<", ">")
_NUM_RE = re.compile(r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")


def filter_vars(expr: FilterExpr) -> set[str]:
    """Every variable name the expression references."""
    if isinstance(expr, FVar):
        return {expr.name}
    if isinstance(expr, (FStr, FNum)):
        return set()
    if isinstance(expr, FCmp):
        return filter_vars(expr.left) | filter_vars(expr.right)
    if isinstance(expr, (FRegex, FBound)):
        return {expr.var.name}
    if isinstance(expr, FNot):
        return filter_vars(expr.inner)
    if isinstance(expr, (FAnd, FOr)):
        return filter_vars(expr.left) | filter_vars(expr.right)
    raise QueryError(f"unknown filter expression {expr!r}")


# ---------------------------------------------------------------------------
# Lowering
# ---------------------------------------------------------------------------


def to_column(expr: FilterExpr) -> Column:
    """Lower a FilterExpr to a Spark Column predicate over the solution's
    variable columns (bare variable names, the select_join convention)."""
    if isinstance(expr, FCmp):
        numeric = isinstance(expr.left, FNum) or isinstance(expr.right, FNum)

        def side(op: FOperand) -> Column:
            # try_cast, not cast: ANSI mode (Spark 4 default) throws on a
            # malformed number, but SPARQL type errors must ELIMINATE the
            # solution (§17.2) — try_cast's NULL does exactly that.
            if isinstance(op, FVar):
                col = F.col(op.name)
                return col.try_cast("double") if numeric else col
            if isinstance(op, FNum):
                return F.lit(op.value)
            return (
                F.lit(op.value).try_cast("double") if numeric else F.lit(op.value)
            )

        l, r = side(expr.left), side(expr.right)
        return {
            "=": l == r,
            "!=": l != r,
            "<": l < r,
            ">": l > r,
            "<=": l <= r,
            ">=": l >= r,
        }[expr.op]
    if isinstance(expr, FRegex):
        pat = expr.pattern
        if "i" in expr.flags:
            pat = "(?i)" + pat
        return F.col(expr.var.name).rlike(pat)
    if isinstance(expr, FBound):
        return F.col(expr.var.name).isNotNull()
    if isinstance(expr, FNot):
        return ~to_column(expr.inner)
    if isinstance(expr, FAnd):
        return to_column(expr.left) & to_column(expr.right)
    if isinstance(expr, FOr):
        return to_column(expr.left) | to_column(expr.right)
    raise QueryError(f"unknown filter expression {expr!r}")


# ---------------------------------------------------------------------------
# Parser (over the text frontend's token stream)
# ---------------------------------------------------------------------------


def _split_head(tokens, heads: tuple[str, ...]) -> str | None:
    """If the next token starts with one of ``heads``, consume and return
    that head, pushing any fused remainder back onto the stream (the
    tokenizer keeps '?x>5'-style runs as one word; comparison operators
    and '!' legitimately fuse with their operand)."""
    tok = tokens.peek()
    if tok is None or not isinstance(tok, str):
        return None
    for head in heads:
        if tok == head:
            tokens.take()
            return head
        if tok.startswith(head) and len(tok) > len(head):
            # don't split '!=' into '!' + '='
            if head in ("!", "=", "<", ">") and tok[len(head)] == "=":
                continue
            tokens.take()
            tokens.toks.insert(tokens.i, tok[len(head):])
            return head
    return None


def parse_filter(tokens, term) -> FilterExpr:
    """Parse one FILTER constraint from ``tokens`` (a plans.text._Tokens —
    any object with peek/take/expect and a ``toks``/``i`` stream). Accepts
    both SPARQL constraint forms: ``FILTER ( expr )`` (bracketted
    expression — the keyword itself is consumed by the caller) and
    ``FILTER REGEX(...)`` / ``FILTER BOUND(...)`` (bare function call).
    ``term`` resolves a bare-word operand to its engine value (the text
    frontend's prefixed-name expansion); pass ``str`` when no prologue
    applies."""

    def parse_or() -> FilterExpr:
        left = parse_and()
        while _split_head(tokens, ("||",)):
            left = FOr(left, parse_and())
        return left

    def parse_and() -> FilterExpr:
        left = parse_unary()
        while _split_head(tokens, ("&&",)):
            left = FAnd(left, parse_unary())
        return left

    def parse_unary() -> FilterExpr:
        if _split_head(tokens, ("!",)):
            return FNot(parse_unary())
        return parse_primary()

    def parse_call(name: str) -> FilterExpr:
        tokens.take()  # the function-name word
        tokens.expect("(")
        v = tokens.take()
        if not (isinstance(v, str) and (v.startswith("?") or v.startswith("$"))):
            raise QueryError(f"{name}() takes a variable, got {v!r}")
        var = FVar(v[1:])
        if name == "BOUND":
            tokens.expect(")")
            return FBound(var)
        if tokens.peek() != ",":
            raise QueryError("REGEX takes (?var, \"pattern\" [, \"flags\"])")
        tokens.take()
        pat = tokens.take()
        if not (isinstance(pat, str) and pat.startswith('"')):
            raise QueryError(f"REGEX pattern must be a string literal, got {pat!r}")
        pattern = re.sub(r"\\(.)", r"\1", pat[1:-1])
        flags = ""
        if tokens.peek() == ",":
            tokens.take()
            fl = tokens.take()
            if not (isinstance(fl, str) and fl.startswith('"')):
                raise QueryError(f"REGEX flags must be a string literal, got {fl!r}")
            flags = fl[1:-1]
            if flags not in ("", "i"):
                raise QueryError(f"unsupported REGEX flags {flags!r} (only 'i')")
        tokens.expect(")")
        return FRegex(var, pattern, flags)

    def operand() -> FOperand:
        tok = tokens.take()
        if not isinstance(tok, str):
            raise QueryError(f"bad FILTER operand {tok!r}")
        if tok.startswith("?") or tok.startswith("$"):
            return FVar(tok[1:])
        if tok.startswith('"'):
            return FStr(re.sub(r"\\(.)", r"\1", tok[1:-1]))
        if _NUM_RE.match(tok):
            return FNum(float(tok))
        if not (tok.startswith("<") and tok.endswith(">")) and any(
            s in tok for s in ("&&", "||", "<", ">", "=", "!")
        ):
            # a fused run like '5&&?y' — the tokenizer keeps operator
            # characters inside words; refuse loudly rather than treat the
            # run as a string operand (the parser-says-so principle).
            raise QueryError(
                f"cannot parse FILTER operand {tok!r}; "
                "separate operators with whitespace"
            )
        # bare word / <iri> / prefixed name → engine term value
        return FStr(term(tok))

    def parse_primary() -> FilterExpr:
        tok = tokens.peek()
        if tok is None:
            raise QueryError("unexpected end of FILTER expression")
        if isinstance(tok, str) and tok.upper() in ("REGEX", "BOUND"):
            return parse_call(tok.upper())
        if tok == "(":
            tokens.take()
            inner = parse_or()
            tokens.expect(")")
            return inner
        left = operand()
        op = _split_head(tokens, _CMP_OPS)
        if op is None:
            raise QueryError(
                f"FILTER operand {left!r} needs a comparison "
                f"(=, !=, <, >, <=, >=) or REGEX/BOUND"
            )
        return FCmp(op, left, operand())

    tok = tokens.peek()
    if isinstance(tok, str) and tok.upper() in ("REGEX", "BOUND"):
        return parse_call(tok.upper())
    tokens.expect("(")
    expr = parse_or()
    tokens.expect(")")
    return expr


def parse_filter_text(text: str) -> FilterExpr:
    """Parse a standalone FILTER expression string (builder convenience:
    ``Sparql().filter_expr("?x > 5 && REGEX(?name, \\"x$\\")")``). The
    surrounding ``FILTER( ... )`` wrapper is optional."""
    from rippledb_spark.plans.text import _Tokens  # lazy: text imports us

    t = _Tokens(text)
    if isinstance(t.peek(), str) and t.peek().upper() == "FILTER":
        t.take()
    if t.peek() == "(":
        expr = parse_filter(t, str)
    else:
        # bare expression without brackets: wrap by parsing the or-level
        t.toks = ["("] + t.toks + [")"]
        expr = parse_filter(t, str)
    if t.peek() is not None:
        raise QueryError(f"trailing tokens in FILTER expression: {t.toks[t.i:]}")
    return expr
