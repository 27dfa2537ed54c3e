"""Flat JSON-LD 1.0 subset in/out (sources/jsonld.py)."""

from __future__ import annotations

import json

import pytest

from rippledb_spark import model
from rippledb_spark.errors import RdfParseError
from rippledb_spark.sources.jsonld import (
    RDF_TYPE,
    XSD,
    parse_jsonld,
    serialize_jsonld_rows,
)


# ---------------------------------------------------------------------------
# pure parser
# ---------------------------------------------------------------------------


def test_parse_all_value_forms():
    doc = {
        "@graph": [
            {
                "@id": "ex:a",
                "@type": "ex:Person",
                "ex:name": "Alice",
                "ex:label": {"@value": "Alicia", "@language": "es"},
                "ex:age": {"@value": "30", "@type": "ex:years"},
                "ex:knows": [{"@id": "ex:b"}, {"@id": "_:n1"}],
            }
        ]
    }
    rows = sorted(parse_jsonld(json.dumps(doc)))
    assert ("ex:a", "named", RDF_TYPE, "ex:Person", "named", None, None) in rows
    assert ("ex:a", "named", "ex:name", "Alice", "literal", None, None) in rows
    assert ("ex:a", "named", "ex:label", "Alicia", "lang_literal", "es", None) in rows
    assert ("ex:a", "named", "ex:age", "30", "typed_literal", None, "ex:years") in rows
    assert ("ex:a", "named", "ex:knows", "ex:b", "named", None, None) in rows
    assert ("ex:a", "named", "ex:knows", "_:n1", "blank", None, None) in rows
    assert len(rows) == 6


def test_parse_native_json_types():
    doc = {"@id": "ex:a", "ex:n": 42, "ex:f": 1.5, "ex:b": True}
    rows = {r[2]: r for r in parse_jsonld(json.dumps(doc))}
    assert rows["ex:n"][3:] == ("42", "typed_literal", None, XSD + "integer")
    assert rows["ex:f"][3:] == ("1.5", "typed_literal", None, XSD + "double")
    assert rows["ex:b"][3:] == ("true", "typed_literal", None, XSD + "boolean")


def test_parse_root_forms_and_json_lines():
    node = {"@id": "ex:a", "ex:p": "v"}
    assert parse_jsonld(json.dumps(node)) == parse_jsonld(json.dumps([node]))
    assert parse_jsonld(json.dumps({"@graph": [node]})) == parse_jsonld(
        json.dumps(node)
    )
    two_lines = json.dumps(node) + "\n" + json.dumps({"@id": "ex:b", "ex:p": "w"})
    assert len(parse_jsonld(two_lines)) == 2
    assert parse_jsonld("") == []


def test_context_vocab_term_and_prefix_expansion():
    doc = {
        "@context": {
            "@vocab": "http://schema.org/",
            "ex": "http://example.org/",
            "homepage": "http://xmlns.com/foaf/0.1/homepage",
        },
        "@id": "ex:item",  # compact IRI: prefix-expands (but @vocab never
        "@type": "Product",  # applies to @id values, only to keys/@type)
        "name": "Widget",
        "homepage": {"@id": "ex:home"},
        "ex:sku": "W-1",
    }
    rows = {(r[2], r[3]) for r in parse_jsonld(json.dumps(doc))}
    assert (RDF_TYPE, "http://schema.org/Product") in rows
    assert ("http://schema.org/name", "Widget") in rows
    assert (
        "http://xmlns.com/foaf/0.1/homepage",
        "http://example.org/home",
    ) in rows
    assert ("http://example.org/sku", "W-1") in rows
    subjects = {r[0] for r in parse_jsonld(json.dumps(doc))}
    assert subjects == {"http://example.org/item"}


def test_refusals_are_loud():
    with pytest.raises(RdfParseError, match="remote @context"):
        parse_jsonld('{"@context": "https://schema.org", "@id": "x", "a": "b"}')
    with pytest.raises(RdfParseError, match="dataset-tier"):
        parse_jsonld('{"@id": "g1", "@graph": [{"@id": "x", "p": "v"}]}')
    with pytest.raises(RdfParseError, match="dataset-tier"):
        parse_jsonld('{"@id": "a", "p": {"@graph": [{"@id": "x"}]}}')
    with pytest.raises(RdfParseError, match="non-string definition"):
        parse_jsonld('{"@context": {"p": {"@container": "@set"}}, "@id": "a", "p": "v"}')
    with pytest.raises(RdfParseError, match="not JSON-LD"):
        parse_jsonld("not json at all {")
    with pytest.raises(RdfParseError, match="both @language and @type"):
        parse_jsonld(
            '{"@id": "a", "p": {"@value": "v", "@language": "en", "@type": "t"}}'
        )
    with pytest.raises(RdfParseError, match="must be a scalar"):
        parse_jsonld('{"@id": "a", "p": {"@value": {"nested": 1}}}')
    with pytest.raises(RdfParseError, match="must be a scalar"):
        parse_jsonld('{"@id": "a", "p": {"@value": ["x"]}}')


def test_null_value_object_dropped_like_expansion():
    # JSON-LD expansion drops a null @value: no triple, no bogus "None"
    rows = parse_jsonld('{"@id": "ex:a", "ex:p": {"@value": null}, "ex:q": "v"}')
    assert [r[2] for r in rows] == ["ex:q"]


# ---------------------------------------------------------------------------
# nested node objects + anonymous nodes (r8 flattening)
# ---------------------------------------------------------------------------


def test_nested_node_with_id_flattens():
    doc = {
        "@id": "ex:a",
        "ex:author": {"@id": "ex:b", "ex:name": "Bea", "@type": "ex:Person"},
    }
    rows = set(parse_jsonld(json.dumps(doc)))
    assert ("ex:a", "named", "ex:author", "ex:b", "named", None, None) in rows
    assert ("ex:b", "named", "ex:name", "Bea", "literal", None, None) in rows
    assert ("ex:b", "named", RDF_TYPE, "ex:Person", "named", None, None) in rows
    assert len(rows) == 3


def test_anonymous_nested_nodes_deterministic_and_distinct():
    # schema.org's default shape: nested author/publisher without @id
    doc = {
        "@id": "ex:art",
        "ex:author": [{"ex:name": "Ann"}, {"ex:name": "Ann"}],  # twins
    }
    r1 = parse_jsonld(json.dumps(doc))
    r2 = parse_jsonld(json.dumps(doc))
    assert sorted(r1) == sorted(r2)  # content-addressed: parses agree
    refs = sorted(r[3] for r in r1 if r[2] == "ex:author")
    assert len(refs) == 2 and refs[0] != refs[1]  # twins stay DISTINCT
    assert all(r.startswith("_:c") for r in refs)
    # each blank carries its own name triple
    names = {(r[0], r[3]) for r in r1 if r[2] == "ex:name"}
    assert names == {(refs[0], "Ann"), (refs[1], "Ann")}


def test_deep_nesting_and_scoped_context():
    doc = {
        "@context": {"name": "http://s.example/name"},
        "@id": "ex:a",
        "ex:child": {
            "@context": {"name": "http://deep.example/name"},
            "name": "inner",
            "ex:grand": {"@id": "ex:g", "name": "deepest"},
        },
    }
    rows = parse_jsonld(json.dumps(doc))
    preds = {r[2] for r in rows}
    # the nested @context override reaches the nested node AND its child
    assert "http://deep.example/name" in preds
    assert "http://s.example/name" not in preds
    by_subj = {(r[0], r[2], r[3]) for r in rows}
    assert ("ex:g", "http://deep.example/name", "deepest") in by_subj


def test_top_level_anonymous_node_allocates():
    rows = parse_jsonld('{"ex:name": "anonymous"}')
    assert len(rows) == 1
    s, s_kind = rows[0][0], rows[0][1]
    assert s.startswith("_:c") and s_kind == "blank"
    # identical anonymous docs on separate JSON-LINES stay distinct
    two = parse_jsonld('{"ex:name": "anonymous"}\n{"ex:name": "anonymous"}')
    assert len({r[0] for r in two}) == 2


def test_nested_round_trip_through_flat_writer():
    doc = {
        "@id": "ex:art",
        "@type": "ex:Article",
        "ex:author": {"ex:name": "Ann", "ex:email": {"@value": "a@x", "@language": "en"}},
        "ex:tag": ["t1", {"@id": "ex:t2"}],
    }
    rows = parse_jsonld(json.dumps(doc))
    cols = ["s", "s_kind", "p", "o_value", "o_kind", "o_lang", "o_datatype"]
    line = serialize_jsonld_rows(dict(zip(cols, r)) for r in rows)
    again = parse_jsonld(line)
    assert sorted(again) == sorted(rows)


def test_serialize_emits_type_keyword_and_sorts():
    rows = [
        dict(zip(model.TRIPLE_KEY, t))
        for t in [
            ("ex:b", "named", "ex:p", "vb", "literal", None, None),
            ("ex:a", "named", RDF_TYPE, "ex:T", "named", None, None),
            ("ex:a", "named", "ex:p", "va", "literal", None, None),
        ]
    ]
    doc = json.loads(serialize_jsonld_rows(rows))
    assert [n["@id"] for n in doc["@graph"]] == ["ex:a", "ex:b"]
    assert doc["@graph"][0]["@type"] == ["ex:T"]
    assert doc["@graph"][0]["ex:p"] == [{"@value": "va"}]


# ---------------------------------------------------------------------------
# distributed round-trip
# ---------------------------------------------------------------------------


def test_store_roundtrip_all_node_kinds(spark, tmp_path):
    from rippledb_spark.store import TripleStore

    rows = [
        model.triple_row("ex:a", "ex:knows", "ex:b"),
        model.triple_row("ex:a", RDF_TYPE, "ex:Person"),
        model.triple_row("ex:a", "ex:name", "Alice", o_kind=model.LITERAL),
        model.triple_row(
            "ex:a", "ex:label", "Alicia", o_kind=model.LANG_LITERAL, o_lang="es"
        ),
        model.triple_row(
            "ex:a", "ex:age", "30",
            o_kind=model.TYPED_LITERAL, o_datatype="xsd:integer",
        ),
        model.triple_row(
            "_:n1", "ex:knows", "_:n2", s_kind=model.BLANK, o_kind=model.BLANK
        ),
        model.triple_row("ex:b", "ex:quote", 'say "hi"\nnow', o_kind=model.LITERAL),
    ]
    st = TripleStore(spark, spark.createDataFrame(rows, model.TRIPLES_SCHEMA))
    path = str(tmp_path / "out.jsonld")
    st.to_jsonld(path)
    back = TripleStore.from_jsonld(spark, path)
    assert sorted(map(tuple, back.df.collect())) == sorted(map(tuple, rows))
    # every emitted line is a complete, independently-parseable document
    import glob

    for part in glob.glob(f"{path}/part-*"):
        for line in open(part):
            if line.strip():
                doc = json.loads(line)
                assert set(doc) == {"@graph"}


def test_multipart_blank_node_labels_survive(spark, tmp_path):
    """Blank labels are verbatim (the N-Triples convention): a subject's
    rows landing in a different part file than references to it must
    still reunify on read."""
    from rippledb_spark.store import TripleStore

    rows = [
        model.triple_row("_:x", "ex:p", f"o{i}", s_kind=model.BLANK)
        for i in range(8)
    ] + [model.triple_row("ex:s", "ex:ref", "_:x", o_kind=model.BLANK)]
    df = spark.createDataFrame(rows, model.TRIPLES_SCHEMA).repartition(4)
    path = str(tmp_path / "multi.jsonld")
    TripleStore(spark, df).to_jsonld(path)
    back = TripleStore.from_jsonld(spark, path)
    assert back.df.count() == 9
    assert back.df.filter("s = '_:x' OR o_value = '_:x'").count() == 9


# ---------------------------------------------------------------------------
# @list ordered collections (r9)
# ---------------------------------------------------------------------------


def test_list_becomes_first_rest_chain():
    from rippledb_spark.sources.jsonld import RDF_FIRST, RDF_NIL, RDF_REST

    doc = {"@id": "ex:menu", "ex:items": {"@list": ["soup", "fish", "pie"]}}
    rows = parse_jsonld(json.dumps(doc))
    by_sp = {}
    for s, sk, p, ov, ok, _, _ in rows:
        by_sp[(s, p)] = (ov, ok)
        if s == "ex:menu":
            head, head_kind = ov, ok
    assert head_kind == "blank" and head.startswith("_:c")
    # walk the chain: three cells, firsts in order, nil-terminated
    items = []
    cell = head
    for _ in range(3):
        first, fk = by_sp[(cell, RDF_FIRST)]
        assert fk == "literal"
        items.append(first)
        cell, rest_kind = by_sp[(cell, RDF_REST)]
    assert items == ["soup", "fish", "pie"]
    assert (cell, rest_kind) == (RDF_NIL, "named")
    assert len(rows) == 1 + 3 * 2  # head ref + (first, rest) per cell


def test_list_cells_deterministic_and_empty_is_nil():
    from rippledb_spark.sources.jsonld import RDF_NIL

    doc = {"@id": "ex:a", "ex:l": {"@list": [1, 2]}}
    a = sorted(parse_jsonld(json.dumps(doc)))
    b = sorted(parse_jsonld(json.dumps(doc)))
    assert a == b  # content-addressed labels: independent parses agree
    empty = parse_jsonld(json.dumps({"@id": "ex:a", "ex:l": {"@list": []}}))
    assert empty == [("ex:a", "named", "ex:l", RDF_NIL, "named", None, None)]
    # null entries drop like expansion does
    dropped = parse_jsonld(
        json.dumps({"@id": "ex:a", "ex:l": {"@list": [None]}})
    )
    assert dropped == [("ex:a", "named", "ex:l", RDF_NIL, "named", None, None)]


def test_nested_list_and_node_items_round_trip():
    from rippledb_spark.sources.jsonld import RDF_FIRST

    doc = {
        "@id": "ex:m",
        "ex:rows": {
            "@list": [
                {"@list": [1, 2]},
                {"@id": "ex:item", "ex:name": "thing"},
                {"@value": "7", "@type": "ex:n"},
            ]
        },
    }
    rows = parse_jsonld(json.dumps(doc))
    # the nested list contributes its own chain: 2 inner cells
    firsts = [r for r in rows if r[2] == RDF_FIRST]
    assert len(firsts) == 3 + 2
    # node item keeps its own property triples
    assert ("ex:item", "named", "ex:name", "thing", "literal", None, None) in rows
    # writer round-trip: explicit chain triples reparse to the same graph
    cols = ["s", "s_kind", "p", "o_value", "o_kind", "o_lang", "o_datatype"]
    line = serialize_jsonld_rows(dict(zip(cols, r)) for r in rows)
    assert sorted(parse_jsonld(line)) == sorted(rows)


def test_list_refusals_are_loud():
    with pytest.raises(RdfParseError, match="extra keys"):
        parse_jsonld(json.dumps(
            {"@id": "ex:a", "ex:l": {"@list": [], "@index": "x"}}
        ))
    with pytest.raises(RdfParseError, match="must be an array"):
        parse_jsonld(json.dumps({"@id": "ex:a", "ex:l": {"@list": "no"}}))
    with pytest.raises(RdfParseError, match="plain array inside @list"):
        parse_jsonld(json.dumps({"@id": "ex:a", "ex:l": {"@list": [[1]]}}))


def test_list_turtle_parity(spark):
    """The @list chain must be the SAME graph the Turtle reader builds
    for ( ... ) — label-agnostic comparison (blank labels differ by
    construction; the chain SHAPE and values must match)."""
    from rippledb_spark.sources.jsonld import RDF_FIRST, RDF_NIL, RDF_REST
    from rippledb_spark.sources.turtle import parse_turtle

    jrows = parse_jsonld(json.dumps(
        {"@id": "http://x/m", "http://x/p": {"@list": ["a", "b"]}}
    ))
    trows = parse_turtle('<http://x/m> <http://x/p> ("a" "b") .')

    def shape(rows):
        # canonicalize blank labels by walking from the named subject
        by_sp = {(r[0], r[2]): (r[3], r[4]) for r in rows}
        out, cell = [], by_sp[("http://x/m", "http://x/p")][0]
        while True:
            out.append(by_sp[(cell, RDF_FIRST)])
            cell, k = by_sp[(cell, RDF_REST)]
            if (cell, k) == (RDF_NIL, "named"):
                return out

    assert shape(jrows) == shape(trows) == [("a", "literal"), ("b", "literal")]


# ---------------------------------------------------------------------------
# @reverse properties (r9)
# ---------------------------------------------------------------------------


def test_reverse_properties_flip_direction():
    doc = {
        "@id": "ex:alice",
        "ex:name": "Alice",
        "@reverse": {"ex:author": [{"@id": "ex:book1"}, {"@id": "ex:book2"}]},
    }
    rows = parse_jsonld(json.dumps(doc))
    assert ("ex:book1", "named", "ex:author", "ex:alice", "named", None, None) in rows
    assert ("ex:book2", "named", "ex:author", "ex:alice", "named", None, None) in rows
    assert ("ex:alice", "named", "ex:name", "Alice", "literal", None, None) in rows
    assert len(rows) == 3


def test_reverse_nested_node_properties_and_anonymous_subject():
    doc = {
        "@id": "ex:alice",
        "@reverse": {
            "ex:knows": {"ex:name": "Bob"},  # anonymous reverse subject
        },
    }
    a = sorted(parse_jsonld(json.dumps(doc)))
    b = sorted(parse_jsonld(json.dumps(doc)))
    assert a == b  # content-addressed: independent parses agree
    rev = [r for r in a if r[2] == "ex:knows"]
    assert len(rev) == 1
    bob, kind = rev[0][0], rev[0][1]
    assert kind == "blank" and bob.startswith("_:c")
    assert rev[0][3] == "ex:alice" and rev[0][4] == "named"
    # the anonymous node's own property attaches to IT
    assert (bob, "blank", "ex:name", "Bob", "literal", None, None) in a
    # writer round-trip: plain triples reparse to the same graph
    cols = ["s", "s_kind", "p", "o_value", "o_kind", "o_lang", "o_datatype"]
    line = serialize_jsonld_rows(dict(zip(cols, r)) for r in a)
    assert sorted(parse_jsonld(line)) == a


def test_reverse_refusals_are_loud():
    with pytest.raises(RdfParseError, match="@reverse of"):
        parse_jsonld(json.dumps({"@id": "ex:a", "@reverse": "nope"}))
    with pytest.raises(RdfParseError, match="cannot be a subject"):
        parse_jsonld(json.dumps(
            {"@id": "ex:a", "@reverse": {"ex:p": "a literal"}}
        ))
    with pytest.raises(RdfParseError, match="cannot be a subject"):
        parse_jsonld(json.dumps(
            {"@id": "ex:a", "@reverse": {"ex:p": {"@list": []}}}
        ))
    with pytest.raises(RdfParseError, match="not a valid @reverse property"):
        parse_jsonld(json.dumps(
            {"@id": "ex:a", "@reverse": {"@type": {"@id": "ex:b"}}}
        ))
