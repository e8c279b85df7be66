"""Plans: pipeline assembly + DuckDB oracle SQL generation for parity."""
