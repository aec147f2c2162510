"""Column-expression library.

Everything here returns pyspark Column objects built from built-in
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen-able. The single
exception (murmur3-seed-0 partition key) lives in hashing.py as an
Arrow-batched pandas UDF, isolated so it never blocks Catalyst pushdown.
"""

from . import crawl, hashing, text, vectors  # noqa: F401
