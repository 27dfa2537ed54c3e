"""Engine operators: triple-pattern access, BGP planning, DML, dedup,
similarity search — each a pure DataFrame→DataFrame function."""
