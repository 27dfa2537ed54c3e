"""Property-based tests (hypothesis) — pure-Python core functions, no
SparkSession needed, so hundreds of examples run in seconds.

SURVEY §5 calls these out as the cheap high-value additions the reference
lacks entirely: roundtrip invariants for the I/O layer and planner
invariants for the pattern ordering.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from rippledb_spark import model
from rippledb_spark.plans.bgp import _order_patterns
from rippledb_spark.plans.sparql import Sparql, Val, Var, parse_unit
from rippledb_spark.sources.rdfio import parse_rdfxml, serialize_rows

# --------------------------------------------------------------------------
# RDF/XML serialize → parse roundtrip
# --------------------------------------------------------------------------

_iri = st.from_regex(r"http://ex\.org/[A-Za-z0-9]{1,10}", fullmatch=True)
_pred = st.from_regex(r"http://ex\.org/ns#[A-Za-z_][A-Za-z0-9_]{0,8}", fullmatch=True)
_blank = st.from_regex(r"_:[A-Za-z][A-Za-z0-9]{0,8}", fullmatch=True)
# literal text excluding control chars (XML 1.0 cannot carry them)
_lit = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_categories=("Cc", "Cs"), exclude_characters="\x00"
    ),
    max_size=40,
)
_lang = st.from_regex(r"[a-z]{2}(-[A-Z]{2})?", fullmatch=True)


@st.composite
def triple_rows(draw):
    s_kind = draw(st.sampled_from([model.NAMED, model.BLANK]))
    s = draw(_iri if s_kind == model.NAMED else _blank)
    p = draw(_pred)
    o_kind = draw(st.sampled_from(model.NODE_KINDS))
    o_lang = o_datatype = None
    if o_kind == model.NAMED:
        o = draw(_iri)
    elif o_kind == model.BLANK:
        o = draw(_blank)
    else:
        o = draw(_lit)
        if o_kind == model.LANG_LITERAL:
            o_lang = draw(_lang)
        elif o_kind == model.TYPED_LITERAL:
            o_datatype = draw(_iri)
    return (s, s_kind, p, o, o_kind, o_lang, o_datatype)


@settings(max_examples=200, deadline=None)
@given(st.lists(triple_rows(), min_size=0, max_size=12, unique=True))
def test_rdfxml_serialize_parse_roundtrip(rows):
    cols = ["s", "s_kind", "p", "o_value", "o_kind", "o_lang", "o_datatype"]
    dict_rows = [dict(zip(cols, r)) for r in rows]
    xml = serialize_rows(dict_rows)
    back = parse_rdfxml(xml)
    assert sorted(back) == sorted(set(rows))


# --------------------------------------------------------------------------
# Sparql parsing invariants
# --------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(st.text(min_size=1, max_size=20).filter(lambda s: "\x00" not in s))
def test_parse_unit_total(raw):
    unit = parse_unit(raw) if not (raw == "$") else None
    if raw.startswith("$") and len(raw) > 1:
        assert unit == Var(raw[1:])
    elif not raw.startswith("$"):
        assert unit == Val(raw)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["$a", "$b", "$c", "v1", "v2"]),
            st.sampled_from(["$a", "$p", "knows", "type"]),
            st.sampled_from(["$b", "$c", "x", "y"]),
        ),
        min_size=1,
        max_size=6,
    )
)
def test_order_patterns_is_permutation(pats):
    q = Sparql().filter([list(p) for p in pats])
    ordered = _order_patterns(q.conds)
    assert sorted(map(repr, ordered)) == sorted(map(repr, q.conds))
    # first pattern is maximally selective
    def sel(c):
        return sum(1 for u in c if not isinstance(u, Var))

    assert sel(ordered[0]) == max(sel(c) for c in q.conds)


# --------------------------------------------------------------------------
# N-Triples line format roundtrip
# --------------------------------------------------------------------------


def _nt_escape(s: str) -> str:
    return (
        s.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )


@settings(max_examples=200, deadline=None)
@given(triple_rows())
def test_ntriples_line_roundtrip(row):
    from rippledb_spark.sources.rdfio import parse_ntriples_line

    s, s_kind, p, o, o_kind, o_lang, o_datatype = row
    subj = s if s_kind == model.BLANK else f"<{s}>"
    if o_kind == model.NAMED:
        obj = f"<{o}>"
    elif o_kind == model.BLANK:
        obj = o
    elif o_kind == model.LANG_LITERAL:
        obj = f'"{_nt_escape(o)}"@{o_lang}'
    elif o_kind == model.TYPED_LITERAL:
        obj = f'"{_nt_escape(o)}"^^<{o_datatype}>'
    else:
        obj = f'"{_nt_escape(o)}"'
    line = f"{subj} <{p}> {obj} ."
    assert parse_ntriples_line(line) == row


# --------------------------------------------------------------------------
# N-Triples escape → unescape inverse (the write_ntriples sink's contract)
# --------------------------------------------------------------------------


def _escape_nt_py(s: str) -> str:
    """Pure-Python mirror of rdfio.nt_escape_expr's replace chain (same
    order: backslash first, then quote/newline/CR/tab)."""
    for raw, esc in (("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t")):
        s = s.replace(raw, esc)
    return s


@given(
    st.text(
        alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
        max_size=60,
    )
)
@settings(max_examples=300, deadline=None)
def test_nt_escape_unescape_inverse(s):
    from rippledb_spark.sources.rdfio import _unescape_nt

    assert _unescape_nt(_escape_nt_py(s)) == s


@given(st.integers(min_value=0, max_value=0x10FFFF))
@settings(max_examples=200, deadline=None)
def test_nt_unicode_escape_forms(cp):
    from rippledb_spark.sources.rdfio import _unescape_nt

    if 0xD800 <= cp <= 0xDFFF:  # surrogates aren't scalar values
        return
    assert _unescape_nt(f"\\u{cp:04X}" if cp <= 0xFFFF else f"\\U{cp:08X}") == chr(cp)


@given(st.text(max_size=30))
@settings(max_examples=200, deadline=None)
def test_nt_line_roundtrip_via_parser(s):
    """Full line-level roundtrip: escape a literal into an N-Triples line,
    parse it back with the production regex + unescaper."""
    from hypothesis import assume

    from rippledb_spark.sources.rdfio import parse_ntriples_line

    assume("\x00" not in s)
    line = f'<http://ex/s> <http://ex/p> "{_escape_nt_py(s)}" .'
    row = parse_ntriples_line(line)
    assert row is not None and row[3] == s


# --------------------------------------------------------------------------
# N-Triples ⊂ Turtle: serialized lines must parse identically in the
# Turtle parser (cross-parser consistency, sources/turtle.py)
# --------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(st.lists(triple_rows(), min_size=0, max_size=8, unique=True))
def test_turtle_parses_ntriples_lines(rows):
    from rippledb_spark.sources.turtle import parse_turtle

    def term(o, kind, lang, dt):
        if kind == model.NAMED:
            return f"<{o}>"
        if kind == model.BLANK:
            return o
        lit = f'"{_nt_escape(o)}"'
        if kind == model.LANG_LITERAL:
            return f"{lit}@{lang}"
        if kind == model.TYPED_LITERAL:
            return f"{lit}^^<{dt}>"
        return lit

    doc = "\n".join(
        f"{term(s, sk, None, None)} <{p}> {term(o, ok, lang, dt)} ."
        for s, sk, p, o, ok, lang, dt in rows
    )
    back = parse_turtle(doc, blank_prefix="")
    assert sorted(back) == sorted(rows)


# --------------------------------------------------------------------------
# Turtle sink → Turtle parser roundtrip (sources/turtle.py:write_turtle).
# The serializer twin mirrors turtle_line_expr exactly (compaction order,
# safe-local regex, rdf:type→'a', NT escape chain).
# --------------------------------------------------------------------------

_TTL_TEST_PREFIXES = {"ex": "http://ex.org/", "ns": "http://ex.org/ns#"}
_SAFE_LOCAL_RE = __import__("re").compile(r"^[A-Za-z0-9][A-Za-z0-9_-]*$")


def _ttl_compact_py(iri: str, prefixes: dict[str, str]) -> str:
    for pfx, ns in prefixes.items():
        local = iri[len(ns):]
        if iri.startswith(ns) and _SAFE_LOCAL_RE.match(local):
            return f"{pfx}:{local}"
    return f"<{iri}>"


def _ttl_line_py(row, prefixes: dict[str, str]) -> str:
    s, s_kind, p, o, o_kind, o_lang, o_dt = row
    subj = _ttl_compact_py(s, prefixes) if s_kind == model.NAMED else s
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    pred = "a" if p == rdf_type else _ttl_compact_py(p, prefixes)
    if o_kind == model.NAMED:
        obj = _ttl_compact_py(o, prefixes)
    elif o_kind == model.BLANK:
        obj = o
    elif o_kind == model.LANG_LITERAL:
        obj = f'"{_nt_escape(o)}"@{o_lang}'
    elif o_kind == model.TYPED_LITERAL:
        obj = f'"{_nt_escape(o)}"^^{_ttl_compact_py(o_dt, prefixes)}'
    else:
        obj = f'"{_nt_escape(o)}"'
    return f"{subj} {pred} {obj} ."


@settings(max_examples=200, deadline=None)
@given(st.lists(triple_rows(), min_size=0, max_size=8, unique=True))
def test_turtle_sink_parser_roundtrip(rows):
    from rippledb_spark.sources.turtle import parse_turtle, turtle_header

    doc = "\n".join(
        turtle_header(_TTL_TEST_PREFIXES)
        + [_ttl_line_py(r, _TTL_TEST_PREFIXES) for r in rows]
    )
    back = parse_turtle(doc, blank_prefix="")
    assert sorted(back) == sorted(set(rows))


# ---------------------------------------------------------------------------
# r6: FILTER expression parser round-trip (render → parse → same AST)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as hst

from rippledb_spark.plans import filters as FL


def _render_value(e) -> str:
    if isinstance(e, FL.FVar):
        return f"?{e.name}"
    if isinstance(e, FL.FNum):
        v = e.value
        return str(int(v)) if v == int(v) and abs(v) < 1e15 else repr(v)
    if isinstance(e, FL.FStr):
        return '"' + e.value.replace("\\", "\\\\").replace('"', '\\"') + '"'
    if isinstance(e, FL.VArith):
        return f"({_render_value(e.left)} {e.op} {_render_value(e.right)})"
    if isinstance(e, FL.VFunc):
        return f"{e.name.upper()}({', '.join(_render_value(a) for a in e.args)})"
    raise AssertionError(e)


def _render_filter(e) -> str:
    if isinstance(e, FL.FCmp):
        return f"({_render_value(e.left)} {e.op} {_render_value(e.right)})"
    if isinstance(e, FL.FStrPred):
        return f"{e.name.upper()}({_render_value(e.left)}, {_render_value(e.right)})"
    if isinstance(e, FL.FBound):
        return f"BOUND(?{e.var.name})"
    if isinstance(e, FL.FNot):
        return f"(! {_render_filter(e.inner)})"
    if isinstance(e, FL.FAnd):
        return f"({_render_filter(e.left)} && {_render_filter(e.right)})"
    if isinstance(e, FL.FOr):
        return f"({_render_filter(e.left)} || {_render_filter(e.right)})"
    raise AssertionError(e)


_names = hst.sampled_from(["a", "b", "xs", "v1"])
_safe_text = hst.text(
    alphabet=hst.characters(whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=127),
    max_size=6,
)


def _values(depth: int):
    base = hst.one_of(
        _names.map(FL.FVar),
        hst.integers(-999, 999).map(lambda n: FL.FNum(float(n))),
        _safe_text.map(FL.FStr),
    )
    if depth <= 0:
        return base
    sub = _values(depth - 1)
    return hst.one_of(
        base,
        hst.tuples(hst.sampled_from("+-*/"), sub, sub).map(
            lambda t: FL.VArith(t[0], t[1], t[2])
        ),
        sub.map(lambda a: FL.VFunc("strlen", (a,))),
        sub.map(lambda a: FL.VFunc("ucase", (a,))),
        hst.tuples(sub, sub).map(lambda t: FL.VFunc("concat", t)),
        hst.tuples(sub, sub).map(lambda t: FL.VFunc("coalesce", t)),
        sub.map(lambda a: FL.VFunc("abs", (a,))),
        sub.map(lambda a: FL.VFunc("md5", (a,))),
    )


def _filters_strategy(depth: int):
    vals = _values(1)
    base = hst.one_of(
        hst.tuples(hst.sampled_from(["=", "!=", "<", ">", "<=", ">="]), vals, vals).map(
            lambda t: FL.FCmp(t[0], t[1], t[2])
        ),
        _names.map(lambda n: FL.FBound(FL.FVar(n))),
        hst.tuples(hst.sampled_from(["strstarts", "strends", "contains"]), vals, vals).map(
            lambda t: FL.FStrPred(t[0], t[1], t[2])
        ),
    )
    if depth <= 0:
        return base
    sub = _filters_strategy(depth - 1)
    return hst.one_of(
        base,
        sub.map(FL.FNot),
        hst.tuples(sub, sub).map(lambda t: FL.FAnd(t[0], t[1])),
        hst.tuples(sub, sub).map(lambda t: FL.FOr(t[0], t[1])),
    )


@settings(max_examples=200, deadline=None)
@given(_filters_strategy(2))
def test_filter_parser_roundtrip(expr):
    """Rendering any FilterExpr to SPARQL text and reparsing yields the
    identical AST — the parser inverts the printer over the whole
    comparison/boolean/string-function grammar."""
    text = _render_filter(expr)
    assert FL.parse_filter_text(text) == expr


@settings(max_examples=100, deadline=None)
@given(_values(2))
def test_value_parser_roundtrip_in_comparison(val):
    got = FL.parse_filter_text(f"({_render_value(val)} = 0)")
    assert got == FL.FCmp("=", val, FL.FNum(0.0))
