"""Cross-format round-robin: one real corpus rides through EVERY format
the engine reads and writes — RDF/XML → N-Triples → Turtle → RDF/JSON →
.ripplebackup → parquet — and the triple SET must be identical at every
hop. One test, six serializations, the strongest interop guarantee the
format layer can give: any asymmetric escape/quoting/term-mapping bug in
any reader/writer pair breaks the chain.
"""

from __future__ import annotations

from rippledb_spark.store import TripleStore

CORPUS = "/root/reference/models/eswc-2011-complete.rdf"


def _rows(st):
    return sorted(map(tuple, st.df.collect()))


def test_format_round_robin(spark, tmp_path):
    st0 = TripleStore.from_rdf(spark, CORPUS)
    want = _rows(st0)
    assert len(want) > 1000  # a real corpus, not a toy

    nt = str(tmp_path / "nt")
    st0.to_ntriples(nt)
    st1 = TripleStore.from_ntriples(spark, nt)
    assert _rows(st1) == want, "rdfxml → ntriples hop diverged"

    ttl = str(tmp_path / "ttl")
    st1.to_turtle(ttl)
    st2 = TripleStore.from_turtle(spark, ttl)
    assert _rows(st2) == want, "ntriples → turtle hop diverged"

    rj = str(tmp_path / "rj")
    st2.to_rdfjson(rj)
    st3 = TripleStore.from_rdfjson(spark, rj)
    assert _rows(st3) == want, "turtle → rdfjson hop diverged"

    rb = str(tmp_path / "rb")
    st3.to_ripplebackup(rb)
    st4 = TripleStore.from_ripplebackup(spark, rb)
    assert _rows(st4) == want, "rdfjson → ripplebackup hop diverged"

    pq = str(tmp_path / "pq")
    st4.persist_to(pq)
    st5 = TripleStore.from_backup(spark, pq)
    assert _rows(st5) == want, "ripplebackup → parquet hop diverged"
