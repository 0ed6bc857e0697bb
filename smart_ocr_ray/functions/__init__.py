"""Pure scalar/string function library (stateless, byte-deterministic).

Every function here is pure Python over strings/bytes so the same code
runs inside Ray ``map_batches`` stages, in the single-row pytest
oracle, and in unit tests — a single source of truth for the
byte-identity contract.
"""
