"""Query plans: the engine's declared query surface.

Every operator from SURVEY.md §2 that is implemented registers a named
query here (``registry.queries()``) together with a DuckDB-executable
oracle SQL string (``registry.oracle_sql()``) used by the driver's
correctness gate.
"""
