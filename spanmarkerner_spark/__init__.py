"""spanmarkerner_spark — PySpark-native knowledge-graph construction engine.

A from-scratch reimplementation of the capabilities of
tomaarsen/SpanMarkerNER (reference at /root/reference, studied in
SURVEY.md) as an idiomatic Spark pipeline:

    pages -> text extraction -> sentences -> tokenized -> scored spans
          -> mentions -> linked mentions -> canonical entities -> triples

Everything is DataFrame + built-in pyspark.sql.functions; Python code
touches data only through Arrow-vectorized UDFs (mapInPandas /
applyInPandas).  See SURVEY.md §7 for the design stance.
"""

__version__ = "0.1.0"

from spanmarkerner_spark.config import SpanMarkerConfig  # noqa: F401
