"""Spark-native data sources (Python DataSource API)."""
