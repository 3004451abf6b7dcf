"""Query plans: the engine's declared query catalog and DuckDB oracles."""
