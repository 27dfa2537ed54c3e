"""Reference `.ripplebackup` migration source/sink (sources/ripplebackup).

Layout + serde shapes per graph.rs:54-222 (from_backup) and 630-695
(persist); K²-Tree walk per the public k2-tree layout (module docstring).
"""

from __future__ import annotations

import json
import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rippledb_spark.sources.ripplebackup import (
    BackupError,
    decode_k2_leaves,
    encode_k2_tree,
    read_ripplebackup,
    write_ripplebackup,
)


# ---------------------------------------------------------------------------
# pure K²-Tree codec
# ---------------------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(
    st.sets(
        st.tuples(st.integers(0, 300), st.integers(0, 300)), max_size=50
    ),
    st.sampled_from([(2, 2), (2, 4), (4, 2)]),
)
def test_k2_codec_roundtrip(points, ks):
    stem_k, leaf_k = ks
    tree = encode_k2_tree(points, stem_k=stem_k, leaf_k=leaf_k)
    assert set(decode_k2_leaves(tree)) == points
    # layout invariants
    assert tree["matrix_width"] == stem_k ** tree["max_slayers"] * leaf_k
    assert len(tree["stems"]) % (stem_k * stem_k) == 0


def test_k2_empty_tree():
    tree = encode_k2_tree([])
    assert list(decode_k2_leaves(tree)) == []
    assert tree["leaves"] == []


def test_k2_single_point_far_corner():
    tree = encode_k2_tree([(127, 127)])
    assert set(decode_k2_leaves(tree)) == {(127, 127)}
    assert tree["matrix_width"] == 128


def test_k2_bitvec_envelope_accepted():
    """The decoder also accepts a packed {bits, data} bit container
    (Lsb0 word order) for the stems/leaves fields."""
    tree = encode_k2_tree({(0, 0), (3, 3)})
    packed = dict(tree)

    def pack(bits, w=64):
        words = [0] * ((len(bits) + w - 1) // w)
        for i, b in enumerate(bits):
            if b:
                words[i // w] |= 1 << (i % w)
        return {"bits": len(bits), "data": words, "word_bits": w}

    packed["stems"] = pack(tree["stems"])
    packed["leaves"] = pack(tree["leaves"])
    assert set(decode_k2_leaves(packed)) == {(0, 0), (3, 3)}


def test_k2_inconsistent_width_raises():
    tree = encode_k2_tree({(1, 1)})
    tree["matrix_width"] = 64  # != stem_k^max_slayers * leaf_k
    with pytest.raises(BackupError, match="inconsistent"):
        list(decode_k2_leaves(tree))


# ---------------------------------------------------------------------------
# directory layout validation (graph.rs:166-186 parity)
# ---------------------------------------------------------------------------


def test_missing_and_invalid_layouts_raise(spark, tmp_path):
    with pytest.raises(BackupError, match="does not exist"):
        read_ripplebackup(spark, str(tmp_path / "nope"))
    root = tmp_path / "b"
    root.mkdir()
    with pytest.raises(BackupError, match="root/trees/"):
        read_ripplebackup(spark, str(root))
    (root / "trees").mkdir()
    with pytest.raises(BackupError, match="root/head.json"):
        read_ripplebackup(spark, str(root))
    (root / "head.json").write_text("{}")
    with pytest.raises(BackupError, match=r"root/\.ripplebackup"):
        read_ripplebackup(spark, str(root))
    (root / ".ripplebackup").write_text("")
    with pytest.raises(BackupError, match="missing field"):
        read_ripplebackup(spark, str(root))


# ---------------------------------------------------------------------------
# full store round-trip (all five node kinds)
# ---------------------------------------------------------------------------


def test_store_roundtrip_all_node_kinds(spark, tmp_path):
    from rippledb_spark import model
    from rippledb_spark.store import TripleStore

    rows = [
        model.triple_row("ex:a", "ex:knows", "ex:b"),
        model.triple_row("ex:a", "ex:name", "Alice", o_kind=model.LITERAL),
        model.triple_row(
            "ex:a", "ex:label", "Alicia", o_kind=model.LANG_LITERAL, o_lang="es"
        ),
        model.triple_row(
            "ex:a",
            "ex:age",
            "30",
            o_kind=model.TYPED_LITERAL,
            o_datatype="xsd:integer",
        ),
        model.triple_row("n1", "ex:knows", "n2", s_kind=model.BLANK, o_kind=model.BLANK),
        model.triple_row("ex:b", "ex:knows", "ex:a"),
    ]
    st = TripleStore(spark, spark.createDataFrame(rows, model.TRIPLES_SCHEMA))
    path = str(tmp_path / "backup")
    st.to_ripplebackup(path)

    # layout matches the reference's walk expectations
    assert os.path.isfile(os.path.join(path, ".ripplebackup"))
    head = json.load(open(os.path.join(path, "head.json")))
    assert set(head) == {
        "dictMax",
        "dictTombstones",
        "dict",
        "predTombstones",
        "predicates",
        "persistLocation",
    }
    # dense contiguous predicate ids, one tree file each
    pred_ids = sorted(i for _, i in head["predicates"])
    assert pred_ids == list(range(len(pred_ids)))
    for i in pred_ids:
        assert os.path.isfile(os.path.join(path, "trees", f"{i}.json"))
    # RdfNode serde form is externally tagged
    tags = {next(iter(node)) for node, _ in head["dict"]}
    assert tags == {"Named", "Blank", "RawLit", "LangTaggedLit", "TypedLit"}

    back = TripleStore.from_ripplebackup(spark, path)
    assert sorted(map(tuple, back.df.collect())) == sorted(map(tuple, rows))


def test_noncontiguous_predicate_ids_raise(spark, tmp_path):
    """from_backup's walk stops at the first id that is neither live nor
    tombstoned (graph.rs:199-210) — a gap means silently dropped slices,
    so the reader refuses."""
    from rippledb_spark import model
    from rippledb_spark.store import TripleStore

    rows = [model.triple_row("a", "p", "b")]
    st = TripleStore(spark, spark.createDataFrame(rows, model.TRIPLES_SCHEMA))
    path = str(tmp_path / "backup")
    st.to_ripplebackup(path)
    head = json.load(open(os.path.join(path, "head.json")))
    head["predicates"] = [[node, i + 1] for node, i in head["predicates"]]
    json.dump(head, open(os.path.join(path, "head.json"), "w"))
    with pytest.raises(BackupError, match="not contiguous"):
        read_ripplebackup(spark, path)


def test_predicate_tombstone_slice_skipped(spark, tmp_path):
    """A tombstoned predicate id (dead slice, no tree file) is legal and
    contributes nothing."""
    from rippledb_spark import model
    from rippledb_spark.store import TripleStore

    rows = [model.triple_row("a", "p", "b")]
    st = TripleStore(spark, spark.createDataFrame(rows, model.TRIPLES_SCHEMA))
    path = str(tmp_path / "backup")
    st.to_ripplebackup(path)
    head = json.load(open(os.path.join(path, "head.json")))
    # move the live predicate to id 1, tombstone id 0
    os.rename(
        os.path.join(path, "trees", "0.json"), os.path.join(path, "trees", "1.json")
    )
    head["predicates"] = [[node, 1] for node, _ in head["predicates"]]
    head["predTombstones"] = [0]
    json.dump(head, open(os.path.join(path, "head.json"), "w"))
    back = read_ripplebackup(spark, path)
    assert [tuple(r) for r in back.collect()] == [tuple(rows[0])]


def test_empty_store_roundtrip(spark, tmp_path):
    """A Graph::new()-equivalent empty store backs up to a layout with no
    tree files and restores to zero triples (reference writes one file
    per live predicate; zero predicates = zero files)."""
    from rippledb_spark import model
    from rippledb_spark.store import TripleStore

    empty = TripleStore(spark, spark.createDataFrame([], model.TRIPLES_SCHEMA))
    path = str(tmp_path / "empty_backup")
    empty.to_ripplebackup(path)
    assert TripleStore.from_ripplebackup(spark, path).df.count() == 0


def test_head_json_streamed_write_is_valid_json(spark, tmp_path):
    """head.json is streamed row-by-row (toLocalIterator) rather than
    collected — the emitted bytes must still be one valid JSON document
    with a dense, id-ordered dict and correct dictMax (r6 verdict #7)."""
    import json as _json

    from rippledb_spark.sources.ripplebackup import write_ripplebackup
    from rippledb_spark.store import TripleStore

    st = TripleStore.from_rows(
        spark,
        [
            ("s1", "p1", "o1"),
            ("s2", "p1", "o2"),
            ("s1", "p2", "o2"),
        ],
    )
    out = str(tmp_path / "bk")
    write_ripplebackup(st.df, out)
    head = _json.load(open(f"{out}/head.json"))
    ids = [i for _, i in head["dict"]]
    assert ids == sorted(ids) == list(range(len(ids)))
    assert head["dictMax"] == len(ids) - 1
    assert head["persistLocation"] == out
    assert head["dictTombstones"] == [] and head["predTombstones"] == []
    assert len(head["predicates"]) == 2
