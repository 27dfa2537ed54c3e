"""Sources & sinks: RDF/XML + N-Triples ingest/export, parquet persistence."""
