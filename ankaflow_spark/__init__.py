"""ankaflow_spark — a PySpark-native analytics / pipeline engine.

A from-scratch engine with the query and data-processing capabilities of
targetta/ankaflow (YAML + SQL pipeline orchestration), re-expressed
Spark-first: stages become temp views over DataFrames, transforms run
through Spark SQL / Catalyst, connectors are Spark readers/writers, and
the ``Fn.*`` macro library is an expression-expansion layer that stays
fully Catalyst-optimizable (no Python UDFs on the hot path).

Reference behavior studied from /root/reference (ankaflow v0.8.1); see
SURVEY.md for the mapping. No code is copied — the execution engine here
is Apache Spark, not DuckDB.
"""

from .session import SparkEngine, get_spark
from .models.core import Stage, Stages
from .plans.flow import Flow

__all__ = ["SparkEngine", "get_spark", "Stage", "Stages", "Flow"]

__version__ = "0.1.0"
