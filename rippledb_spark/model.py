"""Triple-store data model — the flattened-DataFrame form of the reference's
``RdfNode``/``RdfTriple`` types (reference src/lib.rs:15-28).

The reference's five node kinds (Named/Blank/RawLit/LangTaggedLit/TypedLit,
src/lib.rs:21-28) flatten to nullable string columns instead of a UDT: kind
tags + optional lang/datatype. All payloads are strings, exactly like the
reference (no typed literals are ever interpreted — src/rdf/parser.rs:115).

Set semantics: the store is a set of triples (one bit per triple in the
reference's K2Tree, src/datastore/graph.rs:505-508); here that is
``dropDuplicates`` over the full identity tuple.

Scale: there is NO shared integer dictionary (reference graph.rs:33) — parquet
dictionary encoding + Tungsten string comparison replace it, and removing the
global id allocator is precisely what makes the design shard across 1000
executors with no coordination point.
"""

from __future__ import annotations

from pyspark.sql import types as T

from rippledb_spark.errors import SchemaError

NAMED = "named"
BLANK = "blank"
LITERAL = "literal"
LANG_LITERAL = "lang_literal"
TYPED_LITERAL = "typed_literal"

NODE_KINDS = (NAMED, BLANK, LITERAL, LANG_LITERAL, TYPED_LITERAL)

# Full identity of a triple (set semantics dedup key).
TRIPLE_KEY = ["s", "s_kind", "p", "o_value", "o_kind", "o_lang", "o_datatype"]

TRIPLES_SCHEMA = T.StructType(
    [
        T.StructField("s", T.StringType(), nullable=False),
        T.StructField("s_kind", T.StringType(), nullable=False),
        T.StructField("p", T.StringType(), nullable=False),
        T.StructField("o_value", T.StringType(), nullable=False),
        T.StructField("o_kind", T.StringType(), nullable=False),
        T.StructField("o_lang", T.StringType(), nullable=True),
        T.StructField("o_datatype", T.StringType(), nullable=True),
    ]
)


# Quad identity: a named-graph label ahead of the triple identity. NULL g
# = the default graph (SPARQL 1.1 §13 dataset: one default graph + zero or
# more named graphs). The label is an ordinary string column — no graph
# registry object, so the named-graph set shards exactly like any other
# column at 1000-executor scale.
QUAD_KEY = ["g", *TRIPLE_KEY]

QUADS_SCHEMA = T.StructType(
    [T.StructField("g", T.StringType(), nullable=True), *TRIPLES_SCHEMA.fields]
)


def triple_row(
    s: str,
    p: str,
    o_value: str,
    s_kind: str = NAMED,
    o_kind: str = NAMED,
    o_lang: str | None = None,
    o_datatype: str | None = None,
) -> tuple:
    """Build one row tuple in TRIPLES_SCHEMA order (test/fixture helper).

    Mirrors ``triple_into_rdf`` (src/lib.rs:17-19): plain strings become
    Named nodes by default.
    """
    if s_kind not in (NAMED, BLANK):
        raise SchemaError(f"subject kind must be named|blank, got {s_kind!r}")
    if o_kind not in NODE_KINDS:
        raise SchemaError(f"bad object kind {o_kind!r}")
    if (o_lang is not None) != (o_kind == LANG_LITERAL):
        raise SchemaError("o_lang set iff o_kind=lang_literal")
    if (o_datatype is not None) != (o_kind == TYPED_LITERAL):
        raise SchemaError("o_datatype set iff o_kind=typed_literal")
    return (s, s_kind, p, o_value, o_kind, o_lang, o_datatype)


def quad_row(
    g: str | None,
    s: str,
    p: str,
    o_value: str,
    s_kind: str = NAMED,
    o_kind: str = NAMED,
    o_lang: str | None = None,
    o_datatype: str | None = None,
) -> tuple:
    """One row tuple in QUADS_SCHEMA order; ``g=None`` = default graph."""
    return (g, *triple_row(s, p, o_value, s_kind, o_kind, o_lang, o_datatype))
