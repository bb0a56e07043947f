"""geist_spark — a PySpark-native stream-ETL + analytics engine.

A from-scratch re-expression of the capabilities of zpiroux/geist
(reference surveyed in SURVEY.md) on Apache Spark:

- data plane: JSON stream-spec -> compiled DataFrame pipeline
  (Catalyst/Tungsten execute it; batch and Structured Streaming share
  one compiler),
- control plane: registry + supervisor + hooks (thin pure-Python layer),
- extension operators the reference lacks (joins/aggs/windows/dedup/
  similarity/text analysis) designed partition-parallel for 100 TB.

Public API (mirrors geist.go's surface: New/Run/RegisterStream/Publish):

    from geist_spark import Engine
    eng = Engine(spark)
    sid = eng.register_stream(spec_json)
    resource_id = eng.publish(sid, event_bytes)
"""

from geist_spark.session import get_spark, stop_spark
from geist_spark.spec.model import Spec, parse_spec
from geist_spark.engine.api import Engine
from geist_spark.engine.hooks import HookAction, enrich_event

__version__ = "0.1.0"

__all__ = [
    "Engine",
    "HookAction",
    "Spec",
    "enrich_event",
    "get_spark",
    "parse_spec",
    "stop_spark",
    "__version__",
]
