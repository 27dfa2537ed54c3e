"""SPARQL 1.1 Update text forms (plans/update.py + TripleStore.update):
parser, all four forms, literal syntax, immutability, loud errors."""

from __future__ import annotations

import pytest

from rippledb_spark import TripleStore
from rippledb_spark.errors import QueryError
from rippledb_spark.plans.update import (
    DeleteData,
    DeleteWhere,
    InsertData,
    Modify,
    parse_update,
)

EDGES = [("a", "knows", "b"), ("b", "knows", "c"), ("c", "likes", "a")]


@pytest.fixture()
def store(spark):
    return TripleStore.from_rows(spark, EDGES)


def rows(st):
    return sorted(map(tuple, st.df.collect()))


# -- parser -----------------------------------------------------------------


def test_parse_forms():
    assert isinstance(parse_update("INSERT DATA { a p b }"), InsertData)
    assert isinstance(parse_update("DELETE DATA { a p b . }"), DeleteData)
    assert isinstance(parse_update("DELETE WHERE { ?x p ?y }"), DeleteWhere)
    m = parse_update("DELETE { ?x p ?y } INSERT { ?x q ?y } WHERE { ?x p ?y }")
    assert isinstance(m, Modify)
    assert m.delete_template == [["$x", "p", "$y"]]
    assert m.insert_template == [["$x", "q", "$y"]]


def test_parse_literal_forms():
    form = parse_update(
        'PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> INSERT DATA { '
        's name "Ann"@en . s age "30"^^xsd:int . s note "plain" . s ref _:b1 . }'
    )
    by_pred = {r[2]: r for r in form.rows}
    assert by_pred["name"] == ("s", "named", "name", "Ann", "lang_literal", "en", None)
    assert by_pred["age"][4:] == ("typed_literal", None, "http://www.w3.org/2001/XMLSchema#int")
    assert by_pred["note"][4] == "literal"
    assert by_pred["ref"][3:5] == ("_:b1", "blank")


@pytest.mark.parametrize(
    "bad,msg",
    [
        ("INSERT DATA { ?x p o }", "ground"),
        ('INSERT DATA { "lit" p o }', "literal subjects"),
        ("WITH <g> DELETE WHERE { ?x p ?y }", "single-graph"),
        ("DELETE WHERE { }", "at least one"),
        ("SELECT ?x WHERE { ?x p ?y }", "expected INSERT/DELETE"),
        ("INSERT DATA { a p b } extra", "trailing"),
        ("DELETE { ?x p ?y } WHERE { }", "non-empty WHERE"),
    ],
)
def test_parse_rejects(bad, msg):
    with pytest.raises(QueryError, match=msg):
        parse_update(bad)


# -- evaluation -------------------------------------------------------------


def test_insert_and_delete_data_roundtrip(store):
    st2 = store.update('INSERT DATA { a tag "x" . a knows b . }')  # knows dup: set
    assert st2.count() == 4
    st3 = st2.update('DELETE DATA { a tag "x" . zz p qq . }')  # missing = no-op
    assert rows(st3) == rows(store)


def test_delete_where_removes_matches_with_exact_kinds(store):
    st2 = store.update('INSERT DATA { a note "text" . }')
    st3 = st2.update("DELETE WHERE { ?x knows ?y }")
    assert sorted(r[2] for r in rows(st3)) == ["likes", "note"]
    # the literal survived untouched (kind-exact deletion)
    assert any(r[4] == "literal" for r in rows(st3))


def test_delete_where_joins_shared_vars(store):
    # solutions: x=b, y=c, z=a (the only chain). Per spec DELETE WHERE
    # removes EVERY pattern's instantiation — both (b knows c) and
    # (c likes a); (a knows b) survives (its target likes nothing).
    st2 = store.update("DELETE WHERE { ?x knows ?y . ?y likes ?z }")
    assert sorted(r[:3] for r in rows(st2)) == [("a", "named", "knows")]


def test_modify_renames_predicate(store):
    st2 = store.update("DELETE { ?x knows ?y } INSERT { ?x met ?y } WHERE { ?x knows ?y }")
    assert sorted(r[2] for r in rows(st2)) == ["likes", "met", "met"]
    # original snapshot untouched (immutability)
    assert sorted(r[2] for r in rows(store)) == ["knows", "knows", "likes"]


def test_modify_insert_only_and_delete_only(store):
    st2 = store.update("INSERT { ?y known_by ?x } WHERE { ?x knows ?y }")
    assert st2.count() == 5
    st3 = store.update("DELETE { ?x knows ?y } WHERE { ?x knows ?y . ?y likes ?z }")
    assert sorted(r[2] for r in rows(st3)) == ["knows", "likes"]


def test_modify_rejects_unbound_template_var(store):
    with pytest.raises(QueryError, match="not bound"):
        store.update("DELETE { ?x p ?zz } WHERE { ?x knows ?y }")


def test_update_prefix_expansion(store):
    st2 = store.update(
        "PREFIX ex: <http://ex/> INSERT DATA { ex:s ex:p ex:o }"
    )
    assert ("http://ex/s", "named", "http://ex/p", "http://ex/o", "named", None, None) in rows(st2)


def test_modify_ground_where_gates(store):
    # matching ground WHERE → templates instantiate once
    st2 = store.update('INSERT { a met c } WHERE { a knows b }')
    assert ("a", "named", "met", "c", "named", None, None) in rows(st2)
    # non-matching ground WHERE → whole modify is a no-op
    st3 = store.update('INSERT { a met c } WHERE { a knows zz }')
    assert rows(st3) == rows(store)
    st4 = store.update('DELETE { a knows b } WHERE { zz p qq }')
    assert rows(st4) == rows(store)
