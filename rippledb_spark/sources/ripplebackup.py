"""Reference-format `.ripplebackup` migration source (and sink).

The reference persists a graph as a DIRECTORY (graph.rs:630-695):

    root/
      .ripplebackup        -- empty marker file
      head.json            -- the Graph "head": serde_json of
                              {dictMax, dictTombstones, dict,
                               predTombstones, predicates, persistLocation}
                              where dict/predicates are arrays of
                              [RdfNode, id] pairs (BiBTreeMap iterated,
                              graph.rs:649-651) and RdfNode is serde's
                              externally-tagged enum form of the five node
                              kinds (lib.rs:21-28), e.g.
                              {"Named": {"iri": "..."}}.
      trees/{i}.json       -- one serialized K²-Tree per live predicate id
                              i (graph.rs:686-694); from_backup iterates
                              i = 0.. while predicates contains i, treats
                              predicate-tombstone ids as dead slices, and
                              stops at the first unknown id
                              (graph.rs:198-210).

A set leaf bit at matrix position (x, y) in slice i is the triple
(dict[x], predicates[i], dict[y]) — graph.rs:744-750 (Iter::next).

K²-Tree layout (public: Brisaboa, Ladra & Navarro, "k2-trees for Compact
Web Graph Representation", SPIRE 2009; the reference uses the author's
k2_tree crate, Cargo.toml:17): `max_slayers` stem layers of `stem_k`²-bit
nodes stored breadth-first — each SET stem bit spawns one child node in
the next layer, in rank order — then one `leaf_k`²-bit leaf block per set
bit of the last stem layer, again in rank order. Bits within a node are
row-major over its sub-quadrants; matrix_width = stem_k^max_slayers *
leaf_k. This module reads the bit containers as plain JSON arrays of
0/1 (the normalized form our exporter writes — the paper layout, not any
particular Rust bit-container's serde envelope, is the documented
interchange contract; a bitvec-style {bits, data} envelope is accepted
too, see _bits).

Spark shape: one task per trees/{i}.json (binaryFile source — same
pattern as rdfio.read_rdfxml), pure-python K² walk per file inside
mapInPandas (Arrow-batched), then two hash joins against the dict and one
against the predicate map to resolve ids → terms. head.json is parsed
driver-side: the format is the reference's SINGLE-NODE backup (one json
file by construction), so its head always fits where the reference itself
ran; the decoded dict is distributed immediately and all per-triple work
is executor-side.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Iterable, Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from rippledb_spark import model
from rippledb_spark.errors import RippleError


class BackupError(RippleError):
    """Missing or structurally-invalid .ripplebackup directory (reference:
    Error::MissingBackup / Error::InvalidBackup, errors.rs:7-8)."""


# ---------------------------------------------------------------------------
# RdfNode <-> flattened model columns
# ---------------------------------------------------------------------------

_KIND_TO_TAG = {
    model.NAMED: "Named",
    model.BLANK: "Blank",
    model.LITERAL: "RawLit",
    model.LANG_LITERAL: "LangTaggedLit",
    model.TYPED_LITERAL: "TypedLit",
}


def _node_to_json(value: str, kind: str, lang, datatype) -> dict:
    """Flattened model columns → serde externally-tagged RdfNode."""
    if kind == model.NAMED:
        return {"Named": {"iri": value}}
    if kind == model.BLANK:
        return {"Blank": {"id": value}}
    if kind == model.LITERAL:
        return {"RawLit": {"val": value}}
    if kind == model.LANG_LITERAL:
        return {"LangTaggedLit": {"val": value, "lang": lang}}
    if kind == model.TYPED_LITERAL:
        return {"TypedLit": {"val": value, "datatype": datatype}}
    raise BackupError(f"unknown node kind {kind!r}")


def _node_from_json(node: dict) -> tuple[str, str, str | None, str | None]:
    """serde RdfNode → (value, kind, lang, datatype)."""
    if not isinstance(node, dict) or len(node) != 1:
        raise BackupError(f"bad RdfNode {node!r}")
    tag, body = next(iter(node.items()))
    if tag == "Named":
        return (body["iri"], model.NAMED, None, None)
    if tag == "Blank":
        return (body["id"], model.BLANK, None, None)
    if tag == "RawLit":
        return (body["val"], model.LITERAL, None, None)
    if tag == "LangTaggedLit":
        return (body["val"], model.LANG_LITERAL, body["lang"], None)
    if tag == "TypedLit":
        return (body["val"], model.TYPED_LITERAL, None, body["datatype"])
    raise BackupError(f"unknown RdfNode variant {tag!r}")


# ---------------------------------------------------------------------------
# K²-Tree decode / encode (pure python — runs per-file inside mapInPandas)
# ---------------------------------------------------------------------------


def _bits(obj) -> list[int]:
    """Normalize a serialized bit container to a flat 0/1 list.

    Primary form: a JSON array of 0/1 (or booleans) — what our exporter
    writes. Fallback: a bitvec-style envelope {"bits": n, "data": [words]}
    (optionally "word_bits", default 64, Lsb0 order)."""
    if isinstance(obj, list):
        return [1 if b else 0 for b in obj]
    if isinstance(obj, dict) and "data" in obj and "bits" in obj:
        w = int(obj.get("word_bits", 64))
        n = int(obj["bits"])
        words = obj["data"]
        return [(words[i // w] >> (i % w)) & 1 for i in range(n)]
    raise BackupError(f"unrecognized bit container {type(obj).__name__}")


def decode_k2_leaves(tree: dict) -> Iterator[tuple[int, int]]:
    """Yield (x, y) of every SET bit in a serialized K²-Tree.

    Walks the breadth-first stem layers tracking each node's sub-matrix
    origin, then reads one leaf block per set bit of the final stem layer.
    x is the column (subject id), y the row (object id) — the reference's
    Iter maps leaf.x → subject, leaf.y → object (graph.rs:744-750)."""
    sk = int(tree.get("stem_k", 2))
    lk = int(tree.get("leaf_k", 2))
    slayers = int(tree["max_slayers"])
    width = int(tree["matrix_width"])
    if width != (sk**slayers) * lk:
        raise BackupError(
            f"inconsistent K2Tree: matrix_width {width} != "
            f"{sk}^{slayers} * {lk}"
        )
    stems = _bits(tree["stems"])
    leaves = _bits(tree["leaves"])
    if not stems:
        return

    # (row0, col0) origins of the current layer's nodes, in storage order
    origins = [(0, 0)]
    pos = 0
    node_bits = sk * sk
    sub = width // sk  # child sub-matrix width at the current layer
    for _layer in range(slayers):
        next_origins: list[tuple[int, int]] = []
        for row0, col0 in origins:
            node = stems[pos : pos + node_bits]
            if len(node) < node_bits:
                raise BackupError("truncated stem layer")
            pos += node_bits
            for j, bit in enumerate(node):
                if bit:
                    next_origins.append(
                        (row0 + (j // sk) * sub, col0 + (j % sk) * sub)
                    )
        origins = next_origins
        sub //= sk
    # after the final stem layer each surviving origin owns one leaf block
    # of lk×lk bits, rank order
    leaf_bits = lk * lk
    if len(leaves) < leaf_bits * len(origins):
        raise BackupError("truncated leaf layer")
    for b, (row0, col0) in enumerate(origins):
        block = leaves[b * leaf_bits : (b + 1) * leaf_bits]
        for j, bit in enumerate(block):
            if bit:
                yield (col0 + j % lk, row0 + j // lk)


def encode_k2_tree(
    points: Iterable[tuple[int, int]], stem_k: int = 2, leaf_k: int = 2
) -> dict:
    """Inverse of :func:`decode_k2_leaves`: (x, y) set-bit coordinates →
    the serialized K²-Tree dict (normalized 0/1 arrays). Sizes the matrix
    to the smallest stem_k^a * leaf_k covering max(x, y)."""
    pts = set(points)
    maxc = max((max(x, y) for x, y in pts), default=0)
    slayers = 1
    while (stem_k**slayers) * leaf_k <= maxc:
        slayers += 1
    width = (stem_k**slayers) * leaf_k
    if not pts:  # empty slice: an all-zero root stem, no leaves
        return {
            "matrix_width": width,
            "stem_k": stem_k,
            "leaf_k": leaf_k,
            "max_slayers": slayers,
            "stems": [0] * (stem_k * stem_k),
            "leaves": [],
        }

    # group points into leaf blocks keyed by block origin
    blocks: dict[tuple[int, int], list[int]] = {}
    for x, y in pts:
        row0, col0 = (y // leaf_k) * leaf_k, (x // leaf_k) * leaf_k
        blk = blocks.setdefault((row0, col0), [0] * (leaf_k * leaf_k))
        blk[(y - row0) * leaf_k + (x - col0)] = 1

    # stem layers built BOTTOM-UP from the occupied leaf-block origins —
    # each pass groups child origins under their parent and flips the
    # parent's corresponding bit (O(n) per layer; never scans empty space)
    up_layers: list[dict[tuple[int, int], list[int]]] = []
    current = set(blocks)
    child_w = leaf_k
    for _layer in range(slayers):
        parent_w = child_w * stem_k
        parents: dict[tuple[int, int], list[int]] = {}
        for r, c in current:
            pr, pc = (r // parent_w) * parent_w, (c // parent_w) * parent_w
            j = ((r - pr) // child_w) * stem_k + (c - pc) // child_w
            parents.setdefault((pr, pc), [0] * (stem_k * stem_k))[j] = 1
        up_layers.append(parents)
        current = set(parents)
        child_w = parent_w

    # emit breadth-first TOP-DOWN, children in rank order of parent bits
    stems: list[int] = []
    leaves: list[int] = []
    origins = [(0, 0)]
    sub = width // stem_k
    for layer in reversed(up_layers):
        nxt: list[tuple[int, int]] = []
        for row0, col0 in origins:
            node = layer[(row0, col0)]
            stems.extend(node)
            for j, bit in enumerate(node):
                if bit:
                    nxt.append((row0 + (j // stem_k) * sub, col0 + (j % stem_k) * sub))
        origins = nxt
        sub //= stem_k
    for row0, col0 in origins:  # sub == leaf_k here
        leaves.extend(blocks[(row0, col0)])

    return {
        "matrix_width": width,
        "stem_k": stem_k,
        "leaf_k": leaf_k,
        "max_slayers": slayers,
        "stems": stems,
        "leaves": leaves,
    }


# ---------------------------------------------------------------------------
# Read (migration source)
# ---------------------------------------------------------------------------


def read_ripplebackup(spark: SparkSession, path: str) -> DataFrame:
    """`.ripplebackup` directory → triples DataFrame (TRIPLES_SCHEMA).

    Layout validation mirrors graph.rs:166-186 (missing root /
    root/trees/ / root/head.json / root/.ripplebackup each raise)."""
    root = path.rstrip("/")
    trees_dir = os.path.join(root, "trees")
    head_file = os.path.join(root, "head.json")
    dot_file = os.path.join(root, ".ripplebackup")
    if not os.path.isdir(root):
        raise BackupError(f"backup does not exist at {root}")
    for p, elem in (
        (trees_dir, "root/trees/"),
        (head_file, "root/head.json"),
        (dot_file, "root/.ripplebackup"),
    ):
        if not os.path.exists(p):
            raise BackupError(f"backup at {root} is invalid, missing {elem}")

    with open(head_file) as f:
        head = json.load(f)
    for field in ("dictMax", "dictTombstones", "dict", "predTombstones", "predicates"):
        if field not in head:
            raise BackupError(f"head.json missing field {field!r}")

    dict_rows = [
        (int(i), *_node_from_json(node)) for node, i in head["dict"]
    ]
    pred_rows = [
        (int(i), _node_from_json(node)[0]) for node, i in head["predicates"]
    ]
    dict_schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("value", T.StringType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("lang", T.StringType(), True),
            T.StructField("datatype", T.StringType(), True),
        ]
    )
    nodes = spark.createDataFrame(dict_rows, dict_schema)
    preds = spark.createDataFrame(
        pred_rows, "slice long, p string"
    )

    live = {int(i) for _, i in head["predicates"]}
    tomb = {int(i) for i in head["predTombstones"]}
    # from_backup's contiguity walk (graph.rs:199-210): i = 0.. must hit a
    # live predicate or a tombstone until both are exhausted
    i = 0
    while i in live or i in tomb:
        i += 1
    if i < max(live, default=-1) + 1:
        raise BackupError(f"predicate ids not contiguous at {i}")

    def _decode(batches):
        import pandas as pd

        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                name = os.path.basename(fpath)
                slice_id = int(name.split(".")[0])
                tree = json.loads(bytes(content).decode("utf-8"))
                xs, ys = [], []
                for x, y in decode_k2_leaves(tree):
                    xs.append(x)
                    ys.append(y)
                yield pd.DataFrame(
                    {"slice": slice_id, "s_id": pd.Series(xs, dtype="int64"),
                     "o_id": pd.Series(ys, dtype="int64")}
                )

    if glob.glob(os.path.join(trees_dir, "*.json")):
        # pathGlobFilter on the directory (not a glob in the path) — a glob
        # path makes Spark's FileStreamSink probe log a spurious WARN stack
        # trace ("Error while looking for metadata directory").
        files = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.json")
            .load(trees_dir)
            .select("path", "content")
        )
        ids = files.mapInPandas(_decode, schema="slice long, s_id long, o_id long")
    else:
        # an EMPTY graph's backup has no tree files (the reference writes
        # one file per live predicate — zero predicates, zero files);
        # binaryFile raises PATH_NOT_FOUND on an empty glob
        ids = spark.createDataFrame([], "slice long, s_id long, o_id long")

    s_side = nodes.select(
        F.col("id").alias("s_id"),
        F.col("value").alias("s"),
        F.col("kind").alias("s_kind"),
    )
    o_side = nodes.select(
        F.col("id").alias("o_id"),
        F.col("value").alias("o_value"),
        F.col("kind").alias("o_kind"),
        F.col("lang").alias("o_lang"),
        F.col("datatype").alias("o_datatype"),
    )
    # the dict and predicate maps are small relative to the triple set
    # (one row per distinct term vs one per triple) — broadcast both so id
    # resolution never shuffles the decoded triples
    return (
        ids.join(F.broadcast(preds), "slice")
        .join(F.broadcast(s_side), "s_id")
        .join(F.broadcast(o_side), "o_id")
        .select(*model.TRIPLE_KEY)
    )


# ---------------------------------------------------------------------------
# Write (migration sink — also the round-trip fixture generator)
# ---------------------------------------------------------------------------


def write_ripplebackup(df: DataFrame, path: str) -> None:
    """Triples DataFrame → a `.ripplebackup` directory the reference's
    Graph::from_backup walk can load (graph.rs:54-222).

    Id assignment reproduces the reference's shared subject/object dict
    with dense predicate ids; ids are DETERMINISTIC (sorted term order)
    rather than the reference's insertion order — any dense assignment
    loads identically, since ids are internal to one backup.

    The heavy work is DISTRIBUTED: node ids assign via a sorted
    zipWithIndex (no single-partition window), triples resolve ids with
    two hash joins, and each predicate's K²-Tree builds AND writes its
    trees/{i}.json inside one ``applyInPandas`` task. Only head.json is
    driver-side — the format stores the whole term dictionary in one
    JSON file, so that collect is inherent to the single-node target
    (the reference holds the entire graph in memory); use persist_to
    (partitioned parquet) for engine-native backups."""
    spark = df.sparkSession
    t = df.select(*model.TRIPLE_KEY)

    # shared subject/object dictionary, deterministic dense ids
    nodes = (
        t.select(
            F.col("s").alias("value"),
            F.col("s_kind").alias("kind"),
            F.lit(None).cast("string").alias("lang"),
            F.lit(None).cast("string").alias("datatype"),
        )
        .unionByName(
            t.select(
                F.col("o_value").alias("value"),
                F.col("o_kind").alias("kind"),
                F.col("o_lang").alias("lang"),
                F.col("o_datatype").alias("datatype"),
            )
        )
        .distinct()
    )
    with_ids = spark.createDataFrame(
        nodes.orderBy("value", "kind", "lang", "datatype")
        .rdd.zipWithIndex()
        .map(lambda pair: (*pair[0], pair[1])),
        "value string, kind string, lang string, datatype string, id long",
    ).persist()
    preds = sorted(r["p"] for r in t.select("p").distinct().collect())
    pred_ids = {p: i for i, p in enumerate(preds)}

    os.makedirs(os.path.join(path, "trees"), exist_ok=True)
    with open(os.path.join(path, ".ripplebackup"), "w"):
        pass

    # id-resolved (pred, s_id, o_id) pairs; one task per predicate builds
    # and writes its tree file directly (local/shared FS — the same
    # executor-writes pattern as df.write sinks)
    s_ids = with_ids.filter(F.col("lang").isNull() & F.col("datatype").isNull()).select(
        F.col("value").alias("s"),
        F.col("kind").alias("s_kind"),
        F.col("id").alias("s_id"),
    )
    o_ids = with_ids.select(
        F.col("value").alias("o_value"),
        F.col("kind").alias("o_kind"),
        F.col("lang").alias("o_lang"),
        F.col("datatype").alias("o_datatype"),
        F.col("id").alias("o_id"),
    )
    pid_df = spark.createDataFrame(list(pred_ids.items()), "p string, pid long")
    pairs = (
        t.join(s_ids, ["s", "s_kind"])
        .join(
            o_ids,
            [
                t["o_value"] == o_ids["o_value"],
                t["o_kind"] == o_ids["o_kind"],
                t["o_lang"].eqNullSafe(o_ids["o_lang"]),
                t["o_datatype"].eqNullSafe(o_ids["o_datatype"]),
            ],
        )
        .join(F.broadcast(pid_df), "p")
        .select("pid", "s_id", "o_id")
    )

    trees_dir = os.path.join(path, "trees")

    def _build_tree(pdf):
        import pandas as pd

        pid = int(pdf["pid"].iloc[0])
        points = set(zip(pdf["s_id"].astype(int), pdf["o_id"].astype(int)))
        with open(os.path.join(trees_dir, f"{pid}.json"), "w") as f:
            json.dump(encode_k2_tree(points), f)
        return pd.DataFrame({"pid": [pid], "n": [len(points)]})

    written = pairs.groupBy("pid").applyInPandas(_build_tree, schema="pid long, n long")
    written.collect()  # drive the write; one row per predicate back

    # head.json: the one inherently-single-file piece of the format.
    # The dict is STREAMED to disk via toLocalIterator — the driver holds
    # one partition of rows at a time, never the whole dictionary — so a
    # billion-node store is bounded by a partition, not the corpus (ids
    # are dense from 0, so dictMax is just the node count minus one).
    n_nodes = with_ids.count()
    with open(os.path.join(path, "head.json"), "w") as f:
        f.write(
            '{"dictMax": %d, "dictTombstones": [], "dict": ['
            % (n_nodes - 1 if n_nodes else 0)
        )
        for i, r in enumerate(with_ids.orderBy("id").toLocalIterator()):
            entry = json.dumps(
                [
                    _node_to_json(r["value"], r["kind"], r["lang"], r["datatype"]),
                    int(r["id"]),
                ]
            )
            f.write(entry if i == 0 else "," + entry)
        f.write('], "predTombstones": [], "predicates": ')
        json.dump(
            [[_node_to_json(p, model.NAMED, None, None), i] for p, i in pred_ids.items()],
            f,
        )
        f.write(', "persistLocation": ')
        json.dump(path, f)
        f.write("}")
    with_ids.unpersist(blocking=False)
