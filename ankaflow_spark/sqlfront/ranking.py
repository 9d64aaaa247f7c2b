"""Versioned-dedup ranking injection — the reference's single most
behavior-critical operator (reference: ankaflow/common/util.py:336-383,
ankaflow/connections/connection.py:343-369; semantics studied).

When a connection declares ``version`` + ``key``, the tap result is
deduplicated latest-record-wins:
``ROW_NUMBER() OVER (PARTITION BY keys ORDER BY version DESC) = 1``.

Spark-first: expressed as a Window + filter on the DataFrame, which
Catalyst executes as one shuffle on the key columns — the natural
partitioning for incremental tables at 100 TB (no extra exchange when
the downstream consumer groups on the same keys).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

RANK_COL = "__rank__"


def versioned_dedup(
    df: DataFrame,
    keys: List[str],
    version: str,
    tiebreak: Optional[str] = None,
) -> DataFrame:
    """Latest-record-wins dedup. ``tiebreak`` pins the winner among rows
    with equal versions (the reference's ROW_NUMBER pick is engine-
    dependent among ties; callers that need cross-engine determinism pass
    a unique column)."""
    order = [F.desc(version)]
    if tiebreak:
        order.append(F.desc(tiebreak))
    w = W.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn(RANK_COL, F.row_number().over(w))
        .filter(F.col(RANK_COL) == 1)
        .drop(RANK_COL)
    )


def apply_ranking(df: DataFrame, spec: Dict[str, Any]) -> DataFrame:
    """Apply connection-level ranking if the spec declares version+key."""
    version = spec.get("version")
    keys = spec.get("key")
    if not version or not keys:
        return df
    if isinstance(keys, str):
        keys = [keys]
    return versioned_dedup(df, keys=keys, version=version)


def build_ranked_sql(query: str, version: str, keys: List[str]) -> str:
    """SQL-text form for pushing the dedup into a remote system's query
    (JDBC/BigQuery taps — runs inside the remote engine, exactly as the
    reference pushes it). The inner query must be a simple select."""
    keylist = ", ".join(f'"{k}"' for k in keys)
    return (
        f"SELECT * FROM (SELECT *, ROW_NUMBER() OVER "
        f'(PARTITION BY {keylist} ORDER BY "{version}" DESC) AS {RANK_COL} '
        f"FROM ({query}) __inner__) __ranked__ WHERE {RANK_COL} = 1"
    )
