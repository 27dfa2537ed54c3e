"""Turtle (RDF 1.1 TTL) ingest — the third RDF source format beside
RDF/XML (reference parity, S2/S3) and N-Triples (scale path). The
reference reads RDF/XML only (src/rdf/parser.rs:88-122); Turtle is the
format most public RDF is actually published in, so a user switching to
this engine gets it as an engine-tier extension.

Supported subset (covers everything short of RDF-star):
``@prefix``/``@base`` (and SPARQL-style ``PREFIX``/``BASE``),
IRIs + prefixed names, ``a``, blank node labels and anonymous
``[ ... ]`` property lists, object lists (``,``), predicate lists (``;``),
string literals (single/double/long quotes, escapes incl. \\uXXXX), lang
tags, ``^^`` datatypes, and the numeric/boolean abbreviations (mapped to
xsd:integer/decimal/double/boolean typed literals, value kept verbatim —
the engine's literal model is uninterpreted strings, SURVEY §1.2).
RDF collections ``( ... )`` — including nested ones — are parsed into
rdf:first/rdf:rest cons lists matching the RDF/XML
parseType="Collection" handling.

Scale shape: one task per file via binaryFile + mapInPandas, exactly like
rdfio.read_rdfxml — Turtle is not line-splittable (multi-line statements),
so per-file is the correct parallel unit; blank labels get a per-file
prefix so graphs union without collisions.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from urllib.parse import urljoin

from pyspark.sql import DataFrame, SparkSession

from rippledb_spark import model
from rippledb_spark.errors import RdfParseError as ParseError
from rippledb_spark.sources.rdfio import RDF_NS, _unescape_nt

_XSD = "http://www.w3.org/2001/XMLSchema#"
_RDF_TYPE = RDF_NS + "type"
_RDF_FIRST, _RDF_REST, _RDF_NIL = RDF_NS + "first", RDF_NS + "rest", RDF_NS + "nil"

# Master token pattern, longest-match-first. Long strings before short.
_TOKEN = re.compile(
    r"""
    (?P<ws>\s+|\#[^\n]*)
  | (?P<iriref><[^<>"{}|^`\\\x00-\x20]*>)
  | (?P<long_str>\"\"\"(?:[^"\\]|\\.|\"(?!\"\"))*\"\"\"|'''(?:[^'\\]|\\.|'(?!''))*''')
  | (?P<string>"(?:[^"\\\n]|\\.)*"|'(?:[^'\\\n]|\\.)*')
  | (?P<prefix_kw>(?:@prefix|@base|[Pp][Rr][Ee][Ff][Ii][Xx]|[Bb][Aa][Ss][Ee])(?=\s))
  | (?P<langtag>@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*)
  | (?P<dtype_sep>\^\^)
  | (?P<blank>_:[A-Za-z0-9][A-Za-z0-9_.-]*)
  | (?P<pname>[A-Za-z0-9_][A-Za-z0-9_.-]*?:[A-Za-z0-9_:%.-]*|:[A-Za-z0-9_:%.-]*)
  | (?P<double>[+-]?(?:\d+\.\d*|\.\d+|\d+)[eE][+-]?\d+)
  | (?P<decimal>[+-]?\d*\.\d+)
  | (?P<integer>[+-]?\d+)
  | (?P<bool>true|false)
  | (?P<kw_a>a(?![A-Za-z0-9_:-]))
  | (?P<kw_graph>[Gg][Rr][Aa][Pp][Hh](?![A-Za-z0-9_:-]))
  | (?P<punct>[.;,\[\](){}])
    """,
    re.VERBOSE,
)


def _tokenize(text: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    n = len(text)
    while pos < n:
        m = _TOKEN.match(text, pos)
        if m is None:
            raise ParseError(f"turtle: unexpected input at offset {pos}: {text[pos:pos+30]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        val = m.group()
        # Turtle PN_LOCAL / blank-node labels cannot END with '.', but the
        # greedy token regexes swallow a statement-terminating dot written
        # without a space ('ex:s ex:p ex:o.'). Re-emit trailing dots as
        # punct so compact documents parse.
        if kind in ("pname", "blank"):
            stripped = 0
            while val.endswith("."):
                val = val[:-1]
                stripped += 1
            out.append((kind, val))
            out.extend([("punct", ".")] * stripped)
        else:
            out.append((kind, val))
    return out


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]], blank_prefix: str):
        self.toks = tokens
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.base: str | None = None
        self.blank_prefix = blank_prefix
        self.blank_counter = 0
        self.rows: list[tuple] = []

    # -- token helpers ------------------------------------------------------

    def peek(self) -> tuple[str, str] | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> tuple[str, str]:
        t = self.peek()
        if t is None:
            raise ParseError("turtle: unexpected end of input")
        self.i += 1
        return t

    def expect_punct(self, ch: str) -> None:
        kind, val = self.next()
        if kind != "punct" or val != ch:
            raise ParseError(f"turtle: expected {ch!r}, got {val!r}")

    def fresh_blank(self) -> str:
        self.blank_counter += 1
        return f"_:{self.blank_prefix}a{self.blank_counter}"

    # -- term productions ---------------------------------------------------

    def resolve_iri(self, raw: str) -> str:
        iri = _unescape_nt(raw[1:-1])
        return urljoin(self.base, iri) if self.base else iri

    def expand_pname(self, raw: str) -> str:
        pfx, _, local = raw.partition(":")
        if pfx not in self.prefixes:
            raise ParseError(f"turtle: undefined prefix {pfx!r}:")
        return self.prefixes[pfx] + local

    def iri_term(self) -> str:
        kind, val = self.next()
        if kind == "iriref":
            return self.resolve_iri(val)
        if kind == "pname":
            return self.expand_pname(val)
        raise ParseError(f"turtle: expected IRI, got {val!r}")

    def object_term(self) -> tuple[str, str, str | None, str | None]:
        """Returns (value, kind, lang, datatype)."""
        kind, val = self.next()
        if kind == "iriref":
            return self.resolve_iri(val), model.NAMED, None, None
        if kind == "pname":
            return self.expand_pname(val), model.NAMED, None, None
        if kind == "blank":
            return f"_:{self.blank_prefix}{val[2:]}", model.BLANK, None, None
        if kind in ("string", "long_str"):
            quote = 3 if kind == "long_str" else 1
            lit = _unescape_nt(val[quote:-quote])
            nxt = self.peek()
            if nxt and nxt[0] == "langtag":
                self.next()
                return lit, model.LANG_LITERAL, nxt[1][1:], None
            if nxt and nxt[0] == "dtype_sep":
                self.next()
                return lit, model.TYPED_LITERAL, None, self.iri_term()
            return lit, model.LITERAL, None, None
        if kind == "integer":
            return val, model.TYPED_LITERAL, None, _XSD + "integer"
        if kind == "decimal":
            return val, model.TYPED_LITERAL, None, _XSD + "decimal"
        if kind == "double":
            return val, model.TYPED_LITERAL, None, _XSD + "double"
        if kind == "bool":
            return val, model.TYPED_LITERAL, None, _XSD + "boolean"
        if kind == "punct" and val == "[":
            return self.blank_property_list()
        if kind == "punct" and val == "(":
            return self.collection()
        raise ParseError(f"turtle: unexpected object token {val!r}")

    def blank_property_list(self) -> tuple[str, str, None, None]:
        """'[' already consumed: anonymous node with inline properties."""
        b = self.fresh_blank()
        nxt = self.peek()
        if not (nxt and nxt[0] == "punct" and nxt[1] == "]"):
            self.predicate_object_list(b, model.BLANK)
        self.expect_punct("]")
        return b, model.BLANK, None, None

    def collection(self) -> tuple[str, str, None, None]:
        """'(' already consumed: rdf:first/rdf:rest cons list."""
        items: list[tuple[str, str, str | None, str | None]] = []
        while True:
            nxt = self.peek()
            if nxt and nxt[0] == "punct" and nxt[1] == ")":
                self.next()
                break
            items.append(self.object_term())
        if not items:
            return _RDF_NIL, model.NAMED, None, None
        cells = [self.fresh_blank() for _ in items]
        for j, ((o, ok, lang, dt), cell) in enumerate(zip(items, cells)):
            self.rows.append((cell, model.BLANK, _RDF_FIRST, o, ok, lang, dt))
            rest, rk = (
                (cells[j + 1], model.BLANK) if j + 1 < len(cells) else (_RDF_NIL, model.NAMED)
            )
            self.rows.append((cell, model.BLANK, _RDF_REST, rest, rk, None, None))
        return cells[0], model.BLANK, None, None

    # -- statement productions ----------------------------------------------

    def predicate_object_list(self, s: str, s_kind: str) -> None:
        while True:
            nxt = self.peek()
            if nxt and nxt[0] == "kw_a":
                self.next()
                p = _RDF_TYPE
            else:
                p = self.iri_term()
            while True:
                o, ok, lang, dt = self.object_term()
                self.rows.append((s, s_kind, p, o, ok, lang, dt))
                nxt = self.peek()
                if nxt and nxt[0] == "punct" and nxt[1] == ",":
                    self.next()
                    continue
                break
            nxt = self.peek()
            if nxt and nxt[0] == "punct" and nxt[1] == ";":
                # grammar: (';' (verb objectList)?)* — consecutive and
                # trailing ';' before '.' or ']' are both legal
                while nxt and nxt[0] == "punct" and nxt[1] == ";":
                    self.next()
                    nxt = self.peek()
                if nxt and (nxt[0] == "kw_a" or nxt[0] in ("iriref", "pname")):
                    continue
            break

    def statement(self) -> None:
        kind, val = self.next()
        if kind == "prefix_kw":
            kw = val.lstrip("@").lower()
            if kw == "prefix":
                pk, pv = self.next()
                if pk != "pname" or not pv.endswith(":"):
                    raise ParseError(f"turtle: bad prefix name {pv!r}")
                ik, iv = self.next()
                if ik != "iriref":
                    raise ParseError(f"turtle: bad prefix IRI {iv!r}")
                self.prefixes[pv[:-1]] = self.resolve_iri(iv)
            else:  # base
                ik, iv = self.next()
                if ik != "iriref":
                    raise ParseError(f"turtle: bad base IRI {iv!r}")
                self.base = _unescape_nt(iv[1:-1]) if self.base is None else urljoin(
                    self.base, _unescape_nt(iv[1:-1])
                )
            if val.startswith("@"):
                self.expect_punct(".")
            return
        # subject
        if kind == "iriref":
            s, sk = self.resolve_iri(val), model.NAMED
        elif kind == "pname":
            s, sk = self.expand_pname(val), model.NAMED
        elif kind == "blank":
            s, sk = f"_:{self.blank_prefix}{val[2:]}", model.BLANK
        elif kind == "punct" and val == "[":
            s, sk, _, _ = self.blank_property_list()
            # a bare '[...] .' with no following predicates is legal
            nxt = self.peek()
            if nxt and nxt[0] == "punct" and nxt[1] == ".":
                self.next()
                return
        elif kind == "punct" and val == "(":
            s, sk, _, _ = self.collection()
        else:
            raise ParseError(f"turtle: unexpected subject token {val!r}")
        self.predicate_object_list(s, sk)
        self.expect_punct(".")


def parse_turtle(data: bytes | str, blank_prefix: str = "t") -> list[tuple]:
    """Parse one Turtle document → list of TRIPLES_SCHEMA row tuples."""
    text = data.decode("utf-8") if isinstance(data, bytes) else data
    p = _Parser(_tokenize(text), blank_prefix)
    while p.peek() is not None:
        p.statement()
    return p.rows


def read_turtle(spark: SparkSession, path: str) -> DataFrame:
    """Distributed Turtle scan: one task per file (same shape as
    rdfio.read_rdfxml). ``path`` may be a file, directory, or glob."""
    import hashlib

    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in model.TRIPLES_SCHEMA.fields]
        for pdf in batches:
            out: list[tuple] = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                prefix = hashlib.md5(str(fpath).encode()).hexdigest()[:8]
                try:
                    out.extend(parse_turtle(bytes(content), blank_prefix=prefix))
                except ParseError as ex:
                    # name the failing file — in a 10k-file load the bare
                    # offset message is undebuggable
                    raise ParseError(f"{fpath}: {ex}") from ex
            yield pd.DataFrame(out, columns=cols)

    return files.mapInPandas(parse_batch, schema=model.TRIPLES_SCHEMA)


# --------------------------------------------------------------------------
# Turtle export — the third sink beside write_ntriples / to_rdfxml, so every
# format the engine reads also round-trips out (VERDICT r3 "What's missing").
# --------------------------------------------------------------------------

# Conservative PN_LOCAL subset we compact into prefixed names: anything
# outside it (dots, %-escapes, unicode, trailing '.') falls back to <IRI>,
# which is always valid. Leading digits ARE legal Turtle PN_LOCAL.
_SAFE_LOCAL = "^[A-Za-z0-9][A-Za-z0-9_-]*$"


def _compact_expr(col, prefixes: dict[str, str]):
    """IRI column → prefixed-name column where a declared namespace +
    safe local name allows it, else '<iri>'. First declared prefix wins,
    mirrored exactly by the SQL twin in queries/triples.py."""
    import pyspark.sql.functions as F

    expr = F.concat(F.lit("<"), col, F.lit(">"))
    for pfx, ns in reversed(list(prefixes.items())):
        local = F.substring(col, len(ns) + 1, 1_000_000)
        cond = col.startswith(ns) & local.rlike(_SAFE_LOCAL)
        expr = F.when(cond, F.concat(F.lit(pfx + ":"), local)).otherwise(expr)
    return expr


def turtle_line_expr(prefixes: dict[str, str]):
    """One Turtle statement per triples-schema row, all JVM expressions —
    no UDF, no collect (mirrors rdfio.ntriples_line_expr). rdf:type
    compacts to 'a'; literals use the N-Triples escape chain (valid
    Turtle short-string escapes)."""
    import pyspark.sql.functions as F

    from rippledb_spark.sources.rdfio import nt_escape_expr

    subj = F.when(
        F.col("s_kind") == model.NAMED, _compact_expr(F.col("s"), prefixes)
    ).otherwise(F.col("s"))
    pred = F.when(F.col("p") == _RDF_TYPE, F.lit("a")).otherwise(
        _compact_expr(F.col("p"), prefixes)
    )
    lit = F.concat(F.lit('"'), nt_escape_expr(F.col("o_value")), F.lit('"'))
    obj = (
        F.when(F.col("o_kind") == model.NAMED, _compact_expr(F.col("o_value"), prefixes))
        .when(F.col("o_kind") == model.BLANK, F.col("o_value"))
        .when(
            F.col("o_kind") == model.LANG_LITERAL,
            F.concat(lit, F.lit("@"), F.col("o_lang")),
        )
        .when(
            F.col("o_kind") == model.TYPED_LITERAL,
            F.concat(lit, F.lit("^^"), _compact_expr(F.col("o_datatype"), prefixes)),
        )
        .otherwise(lit)
    )
    return F.concat_ws(" ", subj, pred, obj, F.lit("."))


def turtle_header(prefixes: dict[str, str]) -> list[str]:
    return [f"@prefix {pfx}: <{ns}> ." for pfx, ns in prefixes.items()]


def write_turtle(
    triples: DataFrame,
    path: str,
    prefixes: dict[str, str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Distributed Turtle sink: every executor writes its partitions
    directly (``df.write.text``). Each part file gets its own @prefix
    header (prepended per-partition through a pass-through mapInPandas),
    so every part is a self-contained valid Turtle document — exactly
    what read_turtle's one-task-per-file scan expects back."""
    import pandas as pd

    if prefixes is None:
        prefixes = {"rdf": RDF_NS, "xsd": _XSD}
    header = turtle_header(prefixes)
    lines = triples.select(turtle_line_expr(prefixes).alias("value"))

    def prepend(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yield pd.DataFrame({"value": header})
        for b in batches:
            yield b

    lines.mapInPandas(prepend, schema="value string").write.mode(mode).text(path)
