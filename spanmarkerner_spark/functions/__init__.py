"""JVM-side column-expression builders (no Python UDFs in here)."""
