"""JSON-LD 1.0 (flat-document subset) in/out — the most-used RDF
serialization on the web (schema.org markup, web-crawl structured data).

Engine-tier format: the reference reads RDF/XML only
(src/rdf/parser.rs:88-122); this completes the family beside RDF/XML,
N-Triples, Turtle, RDF/JSON, N-Quads, and TriG.

Supported subset (flat documents, stdlib-``json`` parseable):

- a document is one node object, an array of node objects, or a
  ``{"@graph": [...]}`` wrapper (the flattened form); each file may also
  be JSON-LINES — one complete document per line, the writer's output;
- node objects carry ``@id`` (IRI, or ``_:label`` for blank nodes —
  labels kept verbatim, the same multi-part round-trip convention as
  sources/rdfjson.py); a node object WITHOUT ``@id`` (top-level or
  nested) gets a DETERMINISTIC content-addressed blank label (r8):
  ``_:c`` + md5 of (parent subject, predicate, sibling index, canonical
  node JSON), so independent distributed parses of the same document
  allocate identical labels — no RNG, no parse-order counter — while
  distinct-but-identical siblings stay distinct via the index;
- NESTED node objects (r8 — schema.org crawl data's default shape) are
  flattened locally: the parent emits a reference triple to the nested
  node's ``@id`` (given or allocated) and the nested node's own
  properties recurse as that subject's triples. JSON documents are
  trees, so recursion terminates; nested ``@context`` scopes apply;
- ``@type``: string or array of strings → ``rdf:type`` triples;
- every other key is a predicate; values may be arrays (multi-valued),
  strings (plain literals), numbers/booleans (typed literals with the
  JSON-LD 1.0 datatype mapping: integer→xsd:integer, float→xsd:double,
  bool→xsd:boolean), value objects (``@value`` + optional ``@language``
  → language-tagged literal, ``@value`` + optional ``@type`` → typed
  literal), or node references (``{"@id": ...}``);
- ``@list`` (r9): ordered collections become rdf:first/rdf:rest cons
  chains ending in rdf:nil — the same triples the Turtle reader emits
  for ``( ... )`` collections — with content-addressed cell labels;
  the empty list is ``rdf:nil``; null entries drop (JSON-LD 1.0
  §6.11); nested ``@list`` recurses (a 1.1 extension, kept for parity
  with Turtle's nested collections). The writer emits the chain as
  explicit triples (RDF has no list type — ``@list`` is reader sugar),
  so write→read round-trips the graph exactly;
- ``@reverse`` (r9): reverse properties become triples whose SUBJECT
  is the referenced node object and whose object is the carrying node
  (JSON-LD 1.0 §6.12); values must be node objects — a literal or
  list under ``@reverse`` refuses loudly (it cannot be a subject);
- ``@context``: LOCAL simple contexts only — ``@vocab``, term→IRI
  string mappings, and prefix (compact-IRI) expansion. A remote context
  (string URL) or a non-string term definition refuses loudly: this
  container does no network I/O, and silently mis-expanding schema.org
  terms would corrupt data (same refuse-don't-guess policy as SPARQL
  SERVICE, plans/text.py);
- nested named graphs (a node object with both ``@id`` and ``@graph``)
  refuse loudly — use N-Quads/TriG for datasets.

Scale shape (identical to sources/rdfjson.py):

- ``read_jsonld`` — one task per file (binaryFile + mapInPandas);
- ``write_jsonld`` — each Arrow batch emits ONE compact single-line
  ``{"@graph": [...]}`` document; ``df.write.text`` sinks
  executor-parallel. Every line of every part file is a complete,
  independently-parseable flat JSON-LD document, so concatenation is
  graph merge (the self-contained-parts contract shared by
  write_rdfjson / write_turtle / write_rdfxml).
"""

from __future__ import annotations

import hashlib
import json
import math
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

from rippledb_spark import model
from rippledb_spark.errors import RdfParseError

_RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = _RDF_NS + "type"
RDF_FIRST, RDF_REST, RDF_NIL = (
    _RDF_NS + "first", _RDF_NS + "rest", _RDF_NS + "nil",
)
XSD = "http://www.w3.org/2001/XMLSchema#"

_KEYWORDS = {"@id", "@type", "@value", "@language", "@graph", "@context",
             "@reverse"}


def _expand(term: str, ctx: dict[str, str], vocab: str | None) -> str:
    """Term/compact-IRI expansion against a simple local context."""
    if term in ctx:
        return ctx[term]
    if ":" in term:
        prefix, _, suffix = term.partition(":")
        if prefix in ctx:
            return ctx[prefix] + suffix
        return term  # already an IRI (http:..., urn:..., _:...)
    if vocab is not None:
        return vocab + term
    return term


def _expand_id(term: str, ctx: dict[str, str]) -> str:
    """@id expansion: term and compact-IRI (prefix) mappings apply, but
    NEVER @vocab (the spec scopes @vocab to properties and @type), and
    blank labels pass through verbatim."""
    if term.startswith("_:"):
        return term
    if term in ctx:
        return ctx[term]
    if ":" in term:
        prefix, _, suffix = term.partition(":")
        if prefix in ctx:
            return ctx[prefix] + suffix
    return term


def _parse_context(raw) -> tuple[dict[str, str], str | None]:
    if isinstance(raw, str):
        raise RdfParseError(
            f"remote @context {raw!r} is not supported (no network I/O in "
            "the flat subset) — inline the mappings or pre-expand the document"
        )
    if not isinstance(raw, dict):
        raise RdfParseError(f"@context must be a local object, got {type(raw)}")
    ctx: dict[str, str] = {}
    vocab: str | None = None
    for term, defn in raw.items():
        if term == "@vocab":
            if not isinstance(defn, str):
                raise RdfParseError("@vocab must map to an IRI string")
            vocab = defn
        elif isinstance(defn, str):
            ctx[term] = defn
        else:
            raise RdfParseError(
                f"@context term {term!r} has a non-string definition — only "
                "simple term→IRI mappings are in the flat subset"
            )
    return ctx, vocab


def _xsd_literal(v) -> tuple[str, str]:
    """JSON native → (lexical form, xsd datatype), per JSON-LD 1.0 §6.9
    data round-tripping (canonical forms kept deterministic)."""
    if isinstance(v, bool):
        return ("true" if v else "false"), XSD + "boolean"
    if isinstance(v, int):
        return str(v), XSD + "integer"
    if not math.isfinite(v):
        raise RdfParseError(f"non-finite number {v!r} has no XSD lexical form")
    return repr(float(v)), XSD + "double"


def _content_label(parent_subj, pred, index, node) -> str:
    """Deterministic blank label for a node object without @id:
    content-addressed over (parent subject, predicate, sibling index,
    canonical node JSON) — independent parses of the same document agree
    byte-for-byte, and identical-content siblings stay DISTINCT nodes
    via the index (JSON-LD expansion allocates one blank node per
    occurrence, not per content)."""
    basis = json.dumps(
        [parent_subj, pred, index, node],
        sort_keys=True,
        separators=(",", ":"),
        ensure_ascii=False,
    )
    return "_:c" + hashlib.md5(basis.encode("utf-8")).hexdigest()[:16]


def _object_rows(subj, s_kind, pred, v, ctx, vocab, rows, index=0) -> None:
    if isinstance(v, list):
        for i, item in enumerate(v):
            _object_rows(subj, s_kind, pred, item, ctx, vocab, rows, index=i)
        return
    if isinstance(v, str):
        rows.append((subj, s_kind, pred, v, model.LITERAL, None, None))
    elif isinstance(v, bool) or isinstance(v, (int, float)):
        lex, dt = _xsd_literal(v)
        rows.append((subj, s_kind, pred, lex, model.TYPED_LITERAL, None, dt))
    elif isinstance(v, dict):
        if "@list" in v:
            # ordered collection (r9): @list → an rdf:first/rdf:rest cons
            # chain ending in rdf:nil — the SAME triple shape the Turtle
            # reader emits for ( ... ) collections (sources/turtle.py),
            # so schema.org ItemList data round-trips across both
            # formats. Cell labels are content-addressed like every
            # anonymous node here. Nested @list values recurse (a
            # JSON-LD 1.1 extension; 1.0 forbids them — accepting them
            # keeps parity with the Turtle reader's nested collections).
            extra = set(v) - {"@list"}
            if extra:
                raise RdfParseError(
                    f"@list of {subj!r}/{pred!r} carries extra keys "
                    f"{sorted(extra)} — a list object holds @list alone"
                )
            items = v["@list"]
            if not isinstance(items, list):
                raise RdfParseError(
                    f"@list of {subj!r}/{pred!r} must be an array, got "
                    f"{type(items).__name__}"
                )
            # expansion drops null list entries (JSON-LD 1.0 §6.11)
            items = [it for it in items if it is not None]
            if not items:
                rows.append(
                    (subj, s_kind, pred, RDF_NIL, model.NAMED, None, None)
                )
                return
            cells = [
                _content_label(subj, pred, [index, "l", i], it)
                for i, it in enumerate(items)
            ]
            rows.append((subj, s_kind, pred, cells[0], model.BLANK, None, None))
            for i, (cell, it) in enumerate(zip(cells, items)):
                if isinstance(it, list):
                    raise RdfParseError(
                        f"plain array inside @list of {subj!r}/{pred!r} — "
                        "nest it as another {'@list': [...]} object"
                    )
                _object_rows(
                    cell, model.BLANK, RDF_FIRST, it, ctx, vocab, rows,
                    index=[index, "l", i],
                )
                last = i + 1 == len(cells)
                rows.append(
                    (
                        cell,
                        model.BLANK,
                        RDF_REST,
                        RDF_NIL if last else cells[i + 1],
                        model.NAMED if last else model.BLANK,
                        None,
                        None,
                    )
                )
            return
        if "@value" in v:
            val = v["@value"]
            if val is None:
                # JSON-LD expansion drops a null @value — no triple emitted
                return
            if not isinstance(val, (str, bool, int, float)):
                raise RdfParseError(
                    f"@value of {subj!r}/{pred!r} must be a scalar, got "
                    f"{type(val).__name__} {val!r}"
                )
            lang = v.get("@language")
            dtype = v.get("@type")
            if lang is not None and dtype is not None:
                raise RdfParseError(
                    f"@value of {subj!r}/{pred!r} has both @language and @type"
                )
            if isinstance(val, (bool, int, float)) and not isinstance(val, str):
                if lang is not None:
                    raise RdfParseError(
                        f"@language on a non-string @value of {subj!r}/{pred!r}"
                    )
                lex, native_dt = _xsd_literal(val)
                dtype = dtype or native_dt
                rows.append(
                    (subj, s_kind, pred, lex, model.TYPED_LITERAL, None,
                     _expand(dtype, ctx, vocab))
                )
            elif lang is not None:
                rows.append(
                    (subj, s_kind, pred, str(val), model.LANG_LITERAL, lang, None)
                )
            elif dtype is not None:
                rows.append(
                    (subj, s_kind, pred, str(val), model.TYPED_LITERAL, None,
                     _expand(dtype, ctx, vocab))
                )
            else:
                rows.append((subj, s_kind, pred, str(val), model.LITERAL, None, None))
        elif "@graph" in v:
            raise RdfParseError(
                f"named graph under {subj!r}/{pred!r} is dataset-tier — "
                "serialize datasets as N-Quads or TriG"
            )
        else:
            # node object (reference, or nested — flattened here, r8):
            # emit the reference triple, then recurse into its own
            # properties with the nested node as subject
            if "@id" in v:
                ref = _expand_id(str(v["@id"]), ctx)
            else:
                ref = _content_label(subj, pred, index, v)
            kind = model.BLANK if ref.startswith("_:") else model.NAMED
            rows.append((subj, s_kind, pred, ref, kind, None, None))
            if set(v) - {"@id"}:
                _node_rows(v, ctx, vocab, rows, assigned_id=ref)
    else:
        raise RdfParseError(f"null object of {subj!r}/{pred!r} (JSON-LD drops "
                            "null values at expansion — remove the key)")


def _node_rows(node: dict, ctx: dict[str, str], vocab: str | None,
               rows: list[tuple], assigned_id: str | None = None,
               index: int | list = 0) -> None:
    if "@context" in node:
        local_ctx, local_vocab = _parse_context(node["@context"])
        ctx = {**ctx, **local_ctx}
        vocab = local_vocab if local_vocab is not None else vocab
    if "@graph" in node and "@id" in node:
        raise RdfParseError(
            f"named graph {node.get('@id')!r} (@id + @graph) is dataset-tier "
            "— serialize datasets as N-Quads or TriG"
        )
    if "@graph" in node:
        g = node["@graph"]
        if not isinstance(g, list):
            raise RdfParseError("@graph must be an array of node objects")
        for i, child in enumerate(g):
            if not isinstance(child, dict):
                raise RdfParseError(f"@graph entry must be an object, got {child!r}")
            # extend the incoming position, so identical anonymous nodes
            # at the same @graph slot of DIFFERENT documents stay distinct
            _node_rows(child, ctx, vocab, rows, index=[index, i])
        return
    if assigned_id is not None:
        subj = assigned_id  # nested recursion passes the expanded/allocated id
    elif "@id" in node:
        subj = _expand_id(str(node["@id"]), ctx)
    else:
        # top-level anonymous node: deterministic content-addressed label
        subj = _content_label(None, None, index, node)
    s_kind = model.BLANK if subj.startswith("_:") else model.NAMED
    for t in (
        node["@type"] if isinstance(node.get("@type"), list)
        else [node["@type"]] if "@type" in node else []
    ):
        if not isinstance(t, str):
            raise RdfParseError(f"@type of {subj!r} must be IRI string(s)")
        rows.append(
            (subj, s_kind, RDF_TYPE, _expand(t, ctx, vocab), model.NAMED, None, None)
        )
    if "@reverse" in node:
        # reverse properties (r9, JSON-LD 1.0 §6.12 — how schema.org
        # spells "things that point AT me", e.g. a person's works via
        # {"@reverse": {"author": [...]}}): each value is a node object
        # that becomes the SUBJECT of a triple whose object is this
        # node; literals/lists under @reverse are illegal (a literal
        # cannot be a subject) and refuse loudly. Anonymous reverse
        # subjects get content-addressed labels keyed under a
        # "@reverse:"-prefixed predicate so they can never collide with
        # a forward property's allocation at the same index.
        rv = node["@reverse"]
        if not isinstance(rv, dict):
            raise RdfParseError(
                f"@reverse of {subj!r} must be an object mapping "
                f"predicates to node references, got {type(rv).__name__}"
            )
        for rkey, rvals in rv.items():
            if rkey.startswith("@"):
                raise RdfParseError(
                    f"keyword {rkey!r} is not a valid @reverse property"
                )
            pred = _expand(rkey, ctx, vocab)
            items = rvals if isinstance(rvals, list) else [rvals]
            for i, item in enumerate(items):
                if (
                    not isinstance(item, dict)
                    or "@value" in item
                    or "@list" in item
                ):
                    raise RdfParseError(
                        f"@reverse {pred!r} of {subj!r} needs node "
                        "objects (a literal or list cannot be a subject)"
                    )
                if "@id" in item:
                    ref = _expand_id(str(item["@id"]), ctx)
                else:
                    ref = _content_label(subj, "@reverse:" + pred, i, item)
                kind = model.BLANK if ref.startswith("_:") else model.NAMED
                rows.append((ref, kind, pred, subj, s_kind, None, None))
                if set(item) - {"@id"}:
                    _node_rows(item, ctx, vocab, rows, assigned_id=ref)
    for key, v in node.items():
        if key in _KEYWORDS:
            continue
        if key.startswith("@"):
            raise RdfParseError(f"unsupported JSON-LD keyword {key!r}")
        _object_rows(subj, s_kind, _expand(key, ctx, vocab), v, ctx, vocab, rows)


def parse_jsonld(data: bytes | str) -> list[tuple]:
    """Parse one flat JSON-LD document (or JSON-LINES of documents) →
    list of TRIPLES_SCHEMA row tuples."""
    if isinstance(data, bytes):
        data = data.decode("utf-8")
    data = data.strip()
    if not data:
        return []
    try:
        docs = [json.loads(data)]
    except json.JSONDecodeError:
        try:
            docs = [json.loads(line) for line in data.splitlines() if line.strip()]
        except json.JSONDecodeError as ex:
            raise RdfParseError(f"not JSON-LD (nor JSON-lines): {ex}") from ex

    rows: list[tuple] = []
    for d, doc in enumerate(docs):
        # the (document, position) index keys anonymous-node labels, so
        # identical anonymous nodes in different lines/slots stay distinct
        if isinstance(doc, list):
            for i, node in enumerate(doc):
                if not isinstance(node, dict):
                    raise RdfParseError(f"array entry must be an object, got {node!r}")
                _node_rows(node, {}, None, rows, index=[d, i])
        elif isinstance(doc, dict):
            _node_rows(doc, {}, None, rows, index=[d, 0])
        else:
            raise RdfParseError(
                f"JSON-LD root must be an object or array, got {type(doc)}"
            )
    return rows


def _blank_label(v: str) -> str:
    """JSON-LD spells blank nodes as ``_:label`` @ids — a store label
    missing the prefix gains it on write (kind would otherwise be lost)."""
    return v if v.startswith("_:") else "_:" + v


def _value_json(r) -> object:
    """One triple object → its JSON-LD value form (expanded, deterministic)."""
    kind = r["o_kind"]
    if kind == model.BLANK:
        return {"@id": _blank_label(r["o_value"])}
    if kind == model.NAMED:
        return {"@id": r["o_value"]}
    if kind == model.LANG_LITERAL:
        return {"@value": r["o_value"], "@language": r["o_lang"]}
    if kind == model.TYPED_LITERAL:
        return {"@value": r["o_value"], "@type": r["o_datatype"]}
    return {"@value": r["o_value"]}


def serialize_jsonld_rows(rows) -> str:
    """Rows (mappings with the 7 triple fields) → ONE compact single-line
    flat JSON-LD document ({"@graph": [...]}), subjects/predicates/values
    sorted for determinism. rdf:type triples with named objects emit as
    ``@type`` (the idiomatic JSON-LD spelling)."""
    nodes: dict[str, dict] = {}
    for r in rows:
        sid = _blank_label(r["s"]) if r["s_kind"] == model.BLANK else r["s"]
        node = nodes.setdefault(sid, {"@id": sid})
        if r["p"] == RDF_TYPE and r["o_kind"] == model.NAMED:
            node.setdefault("@type", []).append(r["o_value"])
        else:
            node.setdefault(r["p"], []).append(_value_json(r))
    out = []
    for s in sorted(nodes):
        node = nodes[s]
        clean: dict[str, object] = {"@id": node["@id"]}
        if "@type" in node:
            clean["@type"] = sorted(set(node["@type"]))
        for p in sorted(k for k in node if k not in ("@id", "@type")):
            clean[p] = sorted(
                node[p], key=lambda d: json.dumps(d, sort_keys=True)
            )
        out.append(clean)
    return json.dumps({"@graph": out}, separators=(",", ":"),
                      ensure_ascii=False, sort_keys=False)


def read_jsonld(spark: SparkSession, path: str) -> DataFrame:
    """Distributed flat-JSON-LD scan: one task per file (file/dir/glob)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in model.TRIPLES_SCHEMA.fields]
        for pdf in batches:
            out: list[tuple] = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                try:
                    out.extend(parse_jsonld(bytes(content)))
                except RdfParseError as ex:
                    raise RdfParseError(f"{fpath}: {ex}") from ex
            yield pd.DataFrame(out, columns=cols)

    return files.mapInPandas(parse_batch, schema=model.TRIPLES_SCHEMA)


def write_jsonld(triples: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Distributed flat-JSON-LD sink (see module docstring for the
    line-per-document contract)."""
    import pandas as pd

    def to_docs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            line = serialize_jsonld_rows(r for _, r in pdf.iterrows())
            yield pd.DataFrame({"value": [line]})

    (
        triples.select("s", "s_kind", "p", "o_value", "o_kind", "o_lang", "o_datatype")
        .mapInPandas(to_docs, schema="value string")
        .write.mode(mode)
        .text(path)
    )
