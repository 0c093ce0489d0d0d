"""PySpark-native analytics engine re-expressing the capability surface of the
reference ``AI-Driven-Data-Fabric-Architecture`` repo (an NL->SQL Django
service over PostgreSQL, surveyed in /root/repo/SURVEY.md) as an idiomatic
Spark engine, extended with the operators a large-scale (100 TB-class)
LLM-training-data pipeline needs: dedup, similarity search, text analysis,
multimodal column plumbing, and structured streaming.

Layout
------
- ``session``      : SparkSession builder (AQE on, UTC, tuned shuffle width)
- ``sources``      : parquet catalog over the star-schema test tables,
                     employees fixture synthesis, schema introspection
- ``plans``        : NL->SQL rule-based planner (port of the reference's
                     deterministic generator) + plan-level SQL validator
- ``engine``       : the ``process(query)`` lifecycle — cache, execute,
                     serialize, log — matching the reference response shape
- ``operators``    : the full query/operator inventory (SURVEY.md section 2)
                     as named, oracle-checked DataFrame builders
- ``functions``    : reusable column expressions (stable numerics, text,
                     vector math) shared by operators
- ``streaming``    : Structured Streaming variants over the events table
"""

from .session import get_spark  # noqa: F401
from .engine import DataFabricEngine  # noqa: F401

__all__ = ["get_spark", "DataFabricEngine"]
__version__ = "0.1.0"
