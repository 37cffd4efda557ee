"""chronon_spark — a from-scratch PySpark-native feature-engineering engine.

Re-implements the offline query semantics of the reference feature platform
(kambstreat/chronon, surveyed in SURVEY.md) as idiomatic Spark DataFrame plans:

- GroupBy: keyed, (sawtooth-)windowed aggregations over event sources
  (reference semantics: spark/src/main/scala/ai/chronon/spark/GroupBy.scala).
- Join: a left query table enriched point-in-time with many GroupBys with
  zero temporal leakage (reference: spark/.../Join.scala, JoinBase.scala).
- Turn-level features: lag/lead, gap-based sessionization (north-rule additions).
- Training-data pipeline ops: dedup (exact/minhash/simhash/jaccard), ANN
  similarity, text stats, multimodal column plumbing.

Everything is expressed with pyspark.sql Column expressions so Catalyst/AQE
own optimization; Python touches data only through vectorized Arrow batches.
"""

from chronon_spark.api import (  # noqa: F401
    Accuracy,
    Aggregation,
    EntitySource,
    EventSource,
    ExternalPart,
    ExternalSource,
    GroupBy,
    Join,
    JoinPart,
    LabelPart,
    Op,
    Query,
    TimeUnit,
    Window,
)
from chronon_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
