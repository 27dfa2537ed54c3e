"""RDF/XML + N-Triples ingest/export (S2, S3, S8)."""

from __future__ import annotations

from rippledb_spark import TripleStore
from rippledb_spark.sources.rdfio import (
    parse_ntriples_line,
    parse_rdfxml,
    to_rdfxml,
)

RDFXML_SAMPLE = b"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:foaf="http://xmlns.com/foaf/0.1/"
         xmlns:dc="http://purl.org/dc/elements/1.1/">
  <foaf:Person rdf:about="http://ex.org/alice" foaf:nick="ali">
    <foaf:name>Alice</foaf:name>
    <foaf:knows rdf:resource="http://ex.org/bob"/>
    <dc:title xml:lang="fr">Mme</dc:title>
    <foaf:age rdf:datatype="http://www.w3.org/2001/XMLSchema#int">30</foaf:age>
    <foaf:based_near>
      <foaf:Place rdf:about="http://ex.org/wonderland"/>
    </foaf:based_near>
    <foaf:account rdf:nodeID="acct1"/>
  </foaf:Person>
  <rdf:Description rdf:about="http://ex.org/bob">
    <foaf:name>Bob</foaf:name>
  </rdf:Description>
</rdf:RDF>
"""


def test_parse_rdfxml_term_kinds():
    rows = parse_rdfxml(RDFXML_SAMPLE)
    by = {}
    for s, s_kind, p, o, o_kind, lang, dt in rows:
        by.setdefault(p.rsplit("/", 1)[-1].rsplit("#", 1)[-1], []).append(
            (s, s_kind, o, o_kind, lang, dt)
        )
    # typed node element → rdf:type triple
    assert ("http://ex.org/alice", "named", "http://xmlns.com/foaf/0.1/Person", "named", None, None) in by["type"]
    # plain literal
    assert ("http://ex.org/alice", "named", "Alice", "literal", None, None) in by["name"]
    # IRI object
    assert ("http://ex.org/alice", "named", "http://ex.org/bob", "named", None, None) in by["knows"]
    # lang-tagged literal
    assert ("http://ex.org/alice", "named", "Mme", "lang_literal", "fr", None) in by["title"]
    # typed literal
    assert by["age"] == [
        ("http://ex.org/alice", "named", "30", "typed_literal", None, "http://www.w3.org/2001/XMLSchema#int")
    ]
    # nested node element → object is its subject; nested node also typed
    assert ("http://ex.org/alice", "named", "http://ex.org/wonderland", "named", None, None) in by["based_near"]
    assert ("http://ex.org/wonderland", "named", "http://xmlns.com/foaf/0.1/Place", "named", None, None) in by["type"]
    # nodeID property → blank object
    assert ("http://ex.org/alice", "named", "_:acct1", "blank", None, None) in by["account"]
    # attribute property → literal
    assert ("http://ex.org/alice", "named", "ali", "literal", None, None) in by["nick"]


def test_parse_reference_corpus_file():
    data = open("/root/reference/models/cold-2010-complete.rdf", "rb").read()
    rows = parse_rdfxml(data)
    assert len(rows) > 400
    kinds = {r[4] for r in rows}
    assert {"named", "literal"} <= kinds


def test_ntriples_parsing():
    assert parse_ntriples_line("<http://a> <http://p> <http://b> .") == (
        "http://a", "named", "http://p", "http://b", "named", None, None
    )
    assert parse_ntriples_line('<http://a> <http://p> "lit" .') == (
        "http://a", "named", "http://p", "lit", "literal", None, None
    )
    assert parse_ntriples_line('<http://a> <http://p> "hi"@en .') == (
        "http://a", "named", "http://p", "hi", "lang_literal", "en", None
    )
    assert parse_ntriples_line(
        '<http://a> <http://p> "5"^^<http://www.w3.org/2001/XMLSchema#int> .'
    ) == ("http://a", "named", "http://p", "5", "typed_literal", None, "http://www.w3.org/2001/XMLSchema#int")
    assert parse_ntriples_line("_:b1 <http://p> _:b2 .") == (
        "_:b1", "blank", "http://p", "_:b2", "blank", None, None
    )
    assert parse_ntriples_line('<http://a> <http://p> "esc\\"aped\\n" .')[3] == 'esc"aped\n'
    assert parse_ntriples_line("# comment") is None
    assert parse_ntriples_line("") is None


def test_ntriples_spark_roundtrip(spark, tmp_path):
    nt = "\n".join(
        [
            "<http://ex/a> <http://ex/p> <http://ex/b> .",
            '<http://ex/a> <http://ex/q> "v" .',
            "# a comment line",
            "_:x <http://ex/p> <http://ex/a> .",
        ]
    )
    f = tmp_path / "data.nt"
    f.write_text(nt)
    st = TripleStore.from_ntriples(spark, str(f))
    assert st.count() == 3


def test_rdfxml_spark_roundtrip(spark, store_rows=None):
    rows = [
        ("http://ex/a", "named", "http://ex/p#knows", "http://ex/b", "named", None, None),
        ("http://ex/a", "named", "http://ex/p#label", "hello & <world>", "literal", None, None),
        ("_:blank1", "blank", "http://ex/p#knows", "http://ex/a", "named", None, None),
    ]
    st = TripleStore.from_rows(spark, rows)
    xml = to_rdfxml(st.df)
    back = sorted(parse_rdfxml(xml))
    assert back == sorted(rows)


def test_export_drops_non_qname_predicate(spark):
    # predicate with no extractable local name is dropped silently
    # (builder.rs:15-31 semantics)
    rows = [
        ("http://ex/a", "named", "http://ex/p#ok", "x", "literal", None, None),
        ("http://ex/a", "named", "http://bad.example/", "y", "literal", None, None),
    ]
    st = TripleStore.from_rows(spark, rows)
    back = parse_rdfxml(to_rdfxml(st.df))
    assert len(back) == 1
    assert back[0][2] == "http://ex/p#ok"
