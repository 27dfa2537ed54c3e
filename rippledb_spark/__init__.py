"""rippledb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of GGabi/RippleDB (reference: /root/reference,
Rust), re-expressed Spark-first.

Two tiers (SURVEY.md §2):

- **Parity tier**: the RDF triple-store surface (load / DML / BGP query /
  persist / export) of the reference's ``Graph`` type
  (reference ``src/datastore/graph.rs``), built on plain DataFrames:
  :mod:`rippledb_spark.store`, :mod:`rippledb_spark.plans.sparql`.
- **Engine tier**: the relational / streaming / pipeline operator surface
  (joins, aggregations, windows, dedup, similarity search, text analysis,
  multimodal plumbing) the reference lacks, declared in SURVEY.md §2.4:
  :mod:`rippledb_spark.queries`, :mod:`rippledb_spark.operators`,
  :mod:`rippledb_spark.streaming`.

Everything is declarative DataFrame code — Catalyst owns physical planning.
"""

from rippledb_spark.session import get_spark
from rippledb_spark.store import TripleStore
from rippledb_spark.quadstore import QuadStore
from rippledb_spark.plans.sparql import Sparql

__all__ = ["get_spark", "TripleStore", "QuadStore", "Sparql"]
__version__ = "0.1.0"
