"""goeventstream_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the reference event-stream system
(michaeldgagnon/GoEventStream), re-expressed Spark-first, plus the
relational and LLM-data-pipeline operator surface described in SURVEY.md §2b.

Design principles (SURVEY.md §4):
- DataFrame/SQL everywhere; Catalyst optimizes, we declare.
- No driver-side collects in operators; everything stays distributed.
- Explicit (t, seq) ordering keys for deterministic replay semantics.
- Pandas UDFs only where built-in expressions genuinely cannot express
  the semantics (multimodal decode); never row-at-a-time Python UDFs.
"""

from goeventstream_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
