"""Named query pack — the judged operator surface (SURVEY.md §2).

Modules register into :mod:`rippledb_spark.registry` at import time:

- ``relational``      — scans, filters, joins (broadcast/sort-merge/semi/anti),
                        aggregations, rollup/cube, windows, sort/limit/top-k,
                        set ops, scalar functions (engine tier, §2.4)
- ``triples``         — the reference-parity BGP surface over a derived
                        triples table (Q1-Q12 of SURVEY §2.3)
- ``pipeline``        — dedup (exact/minhash/simhash/jaccard), similarity
                        search, text analysis over documents/embeddings
- ``streaming_batch`` — batch-equivalent forms of the streaming windows
                        (tumbling/sliding/session) so they oracle-check
"""
