"""Turtle ingest (engine-tier source format; sources/turtle.py)."""

from __future__ import annotations

import pytest

from rippledb_spark import TripleStore
from rippledb_spark.errors import RdfParseError
from rippledb_spark.sources.turtle import parse_turtle

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"

TTL = """@prefix ex: <http://ex.org/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
@base <http://base.org/> .
ex:alice a ex:Person ;
    ex:name "Alice" ;
    ex:nick "ali"@en ;
    ex:age "30"^^xsd:int ;
    ex:score 3.5 ;
    ex:ok true ;
    ex:knows ex:bob , <rel/carol> , _:dave ;
    ex:addr [ ex:city "Rome" ] ;
    ex:list ( ex:bob 2 ) .
<#frag> ex:v 'single quotes' .
ex:esc ex:q "tab\\tnl\\nuni\\u0041" .
"""


def test_parse_turtle_term_kinds():
    rows = parse_turtle(TTL, blank_prefix="x")
    a = "http://ex.org/alice"
    assert (a, "named", RDF_NS + "type", "http://ex.org/Person", "named", None, None) in rows
    assert (a, "named", "http://ex.org/name", "Alice", "literal", None, None) in rows
    assert (a, "named", "http://ex.org/nick", "ali", "lang_literal", "en", None) in rows
    assert (a, "named", "http://ex.org/age", "30", "typed_literal", None, XSD + "int") in rows
    # numeric/boolean abbreviations become xsd typed literals, verbatim value
    assert (a, "named", "http://ex.org/score", "3.5", "typed_literal", None, XSD + "decimal") in rows
    assert (a, "named", "http://ex.org/ok", "true", "typed_literal", None, XSD + "boolean") in rows
    # object list: pname, base-resolved relative IRI, labeled blank
    knows = {(r[3], r[4]) for r in rows if r[2] == "http://ex.org/knows"}
    assert knows == {
        ("http://ex.org/bob", "named"),
        ("http://base.org/rel/carol", "named"),
        ("_:xdave", "blank"),
    }
    # anonymous [ ... ] node carries its inline property
    (addr,) = [r[3] for r in rows if r[2] == "http://ex.org/addr"]
    assert (addr, "blank", "http://ex.org/city", "Rome", "literal", None, None) in rows
    # @base applies to <#frag>
    assert ("http://base.org/#frag", "named", "http://ex.org/v", "single quotes", "literal", None, None) in rows
    # escapes unescaped
    assert ("http://ex.org/esc", "named", "http://ex.org/q", "tab\tnl\nuniA", "literal", None, None) in rows


def test_parse_turtle_collection_cons_list():
    rows = parse_turtle(TTL, blank_prefix="x")
    (head,) = [r[3] for r in rows if r[2] == "http://ex.org/list"]
    firsts = {r[0]: (r[3], r[4]) for r in rows if r[2] == RDF_NS + "first"}
    rests = {r[0]: r[3] for r in rows if r[2] == RDF_NS + "rest"}
    assert firsts[head] == ("http://ex.org/bob", "named")
    second = rests[head]
    assert firsts[second] == ("2", "typed_literal")
    assert rests[second] == RDF_NS + "nil"


def test_parse_turtle_sparql_style_directives_and_empty_collection():
    rows = parse_turtle(
        "PREFIX ex: <http://e/>\nBASE <http://b/>\n"
        "ex:s ex:p () .\nex:s ex:q <x> ."
    )
    assert ("http://e/s", "named", "http://e/p", RDF_NS + "nil", "named", None, None) in rows
    assert ("http://e/s", "named", "http://e/q", "http://b/x", "named", None, None) in rows


def test_parse_turtle_errors():
    with pytest.raises(RdfParseError, match="undefined prefix"):
        parse_turtle("nope:s <http://e/p> 1 .")
    with pytest.raises(RdfParseError):
        parse_turtle("<http://e/s> <http://e/p> 1 ")  # missing final '.'


def test_from_turtle_distributed(spark, tmp_path):
    """Two files → one store; per-file blank prefixes keep anonymous nodes
    distinct; set semantics dedup the shared named triple."""
    (tmp_path / "a.ttl").write_text(
        "@prefix ex: <http://e/> .\nex:s ex:p ex:o .\nex:s ex:b [ ex:k 1 ] ."
    )
    (tmp_path / "b.ttl").write_text(
        "@prefix ex: <http://e/> .\nex:s ex:p ex:o .\nex:s ex:b [ ex:k 2 ] ."
    )
    st = TripleStore.from_turtle(spark, str(tmp_path / "*.ttl"))
    rows = [tuple(r) for r in st.df.collect()]
    named = [r for r in rows if r[2] == "http://e/p"]
    assert len(named) == 1  # deduped across files
    blanks = {r[3] for r in rows if r[2] == "http://e/b"}
    assert len(blanks) == 2  # per-file prefixes kept them apart
    ks = sorted(r[3] for r in rows if r[2] == "http://e/k")
    assert ks == ["1", "2"]


def test_parse_turtle_compact_forms():
    """Grammar-legal compactions real-world Turtle uses (ADVICE r3):
    no space before the statement dot, repeated ';', mixed-case
    SPARQL directives."""
    rows = parse_turtle(
        "PrEfIx ex: <http://e/>\nBaSe <http://b/>\nex:s ex:p ex:o.", blank_prefix="x"
    )
    assert rows == [("http://e/s", "named", "http://e/p", "http://e/o", "named", None, None)]

    rows = parse_turtle("@prefix ex: <http://e/> . ex:s ex:p ex:o ;; ex:q ex:r .")
    assert len(rows) == 2
    assert rows[1][2] == "http://e/q"

    # blank label before the dot, and a pname local containing dots
    rows = parse_turtle("@prefix ex: <http://e/> . ex:a.b ex:p _:c.", blank_prefix="z")
    assert rows == [("http://e/a.b", "named", "http://e/p", "_:zc", "blank", None, None)]

    # trailing ';' then immediate '.' still fine alongside the new loop
    rows = parse_turtle("@prefix ex: <http://e/> . ex:s ex:p ex:o ; .")
    assert len(rows) == 1


def test_write_turtle_file_roundtrip(spark, tmp_path):
    """write_turtle → read_turtle: full distributed file roundtrip, and
    the Spark line expression must equal the pure-Python twin the
    property test exercises."""
    from rippledb_spark import model
    from rippledb_spark.sources.turtle import read_turtle, write_turtle

    prefixes = {"ex": "http://ex.org/", "ns": "http://ex.org/ns#"}
    rows = [
        ("http://ex.org/a", "named", RDF_NS + "type", "http://ex.org/T", "named", None, None),
        ("http://ex.org/a", "named", "http://ex.org/ns#name", 'say "hi"\n', "literal", None, None),
        ("http://ex.org/b", "named", "http://ex.org/ns#nick", "bee", "lang_literal", "en", None),
        ("http://ex.org/b", "named", "http://ex.org/ns#age", "30", "typed_literal", None, XSD + "int"),
        ("http://ex.org/with.dot", "named", "http://other/p", "http://ex.org/c", "named", None, None),
    ]
    df = spark.createDataFrame(rows, model.TRIPLES_SCHEMA)
    out = str(tmp_path / "ttl_out")
    write_turtle(df, out, prefixes=prefixes)

    # every part file is a self-contained Turtle doc with its own header
    import glob

    parts = glob.glob(out + "/part-*")
    assert parts
    first = open(parts[0]).readline()
    assert first.startswith("@prefix")

    back = sorted(map(tuple, read_turtle(spark, out).collect()))
    assert back == sorted(rows)

    # compacted forms actually appear in the serialized text
    text = "".join(open(p).read() for p in parts)
    assert "ex:a a ex:T ." in text
    assert "<http://ex.org/with.dot>" in text  # unsafe local → full IRI


def test_parse_turtle_nested_collections():
    rows = parse_turtle(
        "@prefix ex: <http://e/> . ex:s ex:p ( (ex:a) ex:b ) .", blank_prefix="n"
    )
    first = {r[0]: r[3] for r in rows if r[2] == RDF_NS + "first"}
    rest = {r[0]: r[3] for r in rows if r[2] == RDF_NS + "rest"}
    head = next(r[3] for r in rows if r[0] == "http://e/s")
    # outer list: [innerHead, ex:b]
    inner_head = first[head]
    assert first[inner_head] == "http://e/a"
    assert rest[inner_head] == RDF_NS + "nil"
    assert first[rest[head]] == "http://e/b"
    assert rest[rest[head]] == RDF_NS + "nil"


def test_turtle_roundtrip_reference_corpus(spark, tmp_path):
    """Corpus-scale sink check: the reference's www-2011 model (16k
    triples) exported through write_turtle and re-ingested must be
    triple-identical (blank labels compared structurally via counts —
    read_turtle re-prefixes them per file)."""
    import pyspark.sql.functions as F

    from rippledb_spark import TripleStore
    from rippledb_spark.sources.turtle import read_turtle, write_turtle

    src = TripleStore.from_rdf(spark, "/root/reference/models/www-2011-complete.rdf")
    out = str(tmp_path / "corpus_ttl")
    write_turtle(src.df, out)
    back = read_turtle(spark, out)
    assert back.count() == src.df.count()
    # non-blank triples must match exactly (blank labels are re-prefixed)
    def named_only(df):
        return sorted(
            map(
                tuple,
                df.filter(
                    (F.col("s_kind") == "named") & (F.col("o_kind") != "blank")
                ).collect(),
            )
        )

    assert named_only(back) == named_only(src.df)
    # blank-node structure preserved: per-predicate counts identical
    counts = lambda df: sorted(
        map(tuple, df.groupBy("p", "s_kind", "o_kind").count().collect())
    )
    assert counts(back) == counts(src.df)


def test_parse_turtle_empty_prefix():
    rows = parse_turtle("@prefix : <http://d/> . :a :b :c .")
    assert rows == [("http://d/a", "named", "http://d/b", "http://d/c", "named", None, None)]
