"""Custom source connectors (Spark 4 Python DataSource API)."""
