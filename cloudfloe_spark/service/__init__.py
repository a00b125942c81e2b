"""Service parity layer — the reference's own app-level operators.

The engine (joins, windows, aggregates, …) is delegated to Spark SQL the
same way the reference delegates to DuckDB; this package re-implements the
four cloudfloe-specific layers identified in SURVEY.md §0:

- policy     (what SQL is allowed)            → :mod:`validation`
- rewrite    (scan-function conversion)       → :mod:`convert`
- connection (per-request config + probing)   → :mod:`config`, :mod:`engine`
- API/stats  (HTTP surface, QueryResponse)    → :mod:`api`, :mod:`engine`
"""
