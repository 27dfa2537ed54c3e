"""Typed error surface (reference parity: src/errors.rs).

The reference enumerates error kinds per subsystem (src/errors.rs:1-129 —
parse, query, persistence). Here each is a ValueError subclass so existing
``except ValueError`` call sites keep working while callers that care can
catch precisely.
"""

from __future__ import annotations


class RippleError(ValueError):
    """Base for all engine errors."""


class QueryError(RippleError):
    """Malformed Sparql query (bad variable, pattern arity, undeclared var
    in strict mode — the reference PANICS here, query.rs:50-59; we raise)."""


class RdfParseError(RippleError):
    """Unparseable RDF input (reference: parser error enums, errors.rs)."""


class SchemaError(RippleError):
    """DataFrame does not conform to the triples schema (model.TRIPLE_KEY)."""
