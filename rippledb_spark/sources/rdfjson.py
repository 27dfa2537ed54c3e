"""RDF/JSON (the W3C "RDF 1.1 JSON Alternate Serialization" note) in/out.

Completes the format family beside RDF/XML, N-Triples, and Turtle
(engine-tier: the reference reads RDF/XML only, src/rdf/parser.rs). The
format is a nested object::

    { "<subject>": { "<predicate>": [ {"value": ..., "type":
      "uri" | "literal" | "bnode", "lang"?: ..., "datatype"?: ...} ] } }

with ``_:name`` subject keys for blank nodes. Blank-node labels are kept
VERBATIM on read (the N-Triples convention, not RDF/XML's per-file
prefixing) so a multi-part self-export round-trips even when a blank
node's own subject rows land in a different part file than references
to it; merging independent files with colliding labels is the caller's
concern, exactly as with N-Triples.

Scale shape:

- ``read_rdfjson`` — one task per file (binaryFile + mapInPandas, the
  RDF/XML scan's shape). Each file may be ONE document (pretty or
  compact) or JSON-LINES (one complete RDF/JSON document per line — the
  writer's output), detected per file.
- ``write_rdfjson`` — distributed: each Arrow batch groups its rows by
  subject and emits ONE compact single-line document; ``df.write.text``
  then writes executor-parallel. Every line of every part file is a
  complete, independently-parseable RDF/JSON document (a graph is the
  union of its documents, so concatenation is merge — the same
  self-contained-parts contract as write_turtle / write_rdfxml).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

from rippledb_spark import model
from rippledb_spark.errors import RdfParseError


def parse_rdfjson(data: bytes | str) -> list[tuple]:
    """Parse one RDF/JSON document (or JSON-LINES of documents) → list of
    TRIPLES_SCHEMA row tuples."""
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
            raise RdfParseError(f"not RDF/JSON (nor JSON-lines): {ex}") from ex

    rows: list[tuple] = []
    for doc in docs:
        if not isinstance(doc, dict):
            raise RdfParseError(f"RDF/JSON root must be an object, got {type(doc)}")
        for subj, preds in doc.items():
            s_kind = model.BLANK if subj.startswith("_:") else model.NAMED
            if not isinstance(preds, dict):
                raise RdfParseError(f"subject {subj!r} must map to an object")
            for pred, objs in preds.items():
                if not isinstance(objs, list):
                    raise RdfParseError(
                        f"predicate {pred!r} of {subj!r} must map to an array"
                    )
                for obj in objs:
                    if not isinstance(obj, dict) or "value" not in obj:
                        raise RdfParseError(
                            f"object of {subj!r}/{pred!r} must be an object "
                            f"with a 'value', got {obj!r}"
                        )
                    value, typ = obj["value"], obj.get("type", "literal")
                    lang, dtype = obj.get("lang"), obj.get("datatype")
                    if typ == "uri":
                        kind, lang, dtype = model.NAMED, None, None
                    elif typ == "bnode":
                        kind, lang, dtype = model.BLANK, None, None
                        if not str(value).startswith("_:"):
                            value = "_:" + str(value)
                    elif typ == "literal":
                        if lang is not None:
                            kind, dtype = model.LANG_LITERAL, None
                        elif dtype is not None:
                            kind = model.TYPED_LITERAL
                        else:
                            kind = model.LITERAL
                    else:
                        raise RdfParseError(f"unknown RDF/JSON object type {typ!r}")
                    rows.append((subj, s_kind, pred, str(value), kind, lang, dtype))
    return rows


def serialize_rdfjson_rows(rows) -> str:
    """Rows (mappings with the 7 triple fields) → ONE compact single-line
    RDF/JSON document, subjects and predicates sorted for determinism."""
    doc: dict[str, dict[str, list[dict]]] = {}
    for r in rows:
        o: dict[str, object] = {"value": r["o_value"]}
        kind = r["o_kind"]
        if kind == model.NAMED:
            o["type"] = "uri"
        elif kind == model.BLANK:
            o["type"] = "bnode"
        else:
            o["type"] = "literal"
            if kind == model.LANG_LITERAL:
                o["lang"] = r["o_lang"]
            elif kind == model.TYPED_LITERAL:
                o["datatype"] = r["o_datatype"]
        doc.setdefault(r["s"], {}).setdefault(r["p"], []).append(o)
    ordered = {
        s: {p: sorted(objs, key=lambda d: (d["value"], d.get("type", "")))
            for p, objs in sorted(preds.items())}
        for s, preds in sorted(doc.items())
    }
    return json.dumps(ordered, separators=(",", ":"), ensure_ascii=False)


def read_rdfjson(spark: SparkSession, path: str) -> DataFrame:
    """Distributed RDF/JSON scan: one task per file (file/dir/glob)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in model.TRIPLES_SCHEMA.fields]
        for pdf in batches:
            out: list[tuple] = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                try:
                    out.extend(parse_rdfjson(bytes(content)))
                except RdfParseError as ex:
                    raise RdfParseError(f"{fpath}: {ex}") from ex
            yield pd.DataFrame(out, columns=cols)

    return files.mapInPandas(parse_batch, schema=model.TRIPLES_SCHEMA)


def write_rdfjson(triples: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Distributed RDF/JSON sink (see module docstring for the
    line-per-document contract)."""
    import pandas as pd

    def to_docs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            line = serialize_rdfjson_rows(r for _, r in pdf.iterrows())
            yield pd.DataFrame({"value": [line]})

    (
        triples.select("s", "p", "o_value", "o_kind", "o_lang", "o_datatype")
        .mapInPandas(to_docs, schema="value string")
        .write.mode(mode)
        .text(path)
    )
