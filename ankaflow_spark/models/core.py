"""Pipeline stage models (engine-agnostic, Pydantic).

Same YAML surface as the reference's stage tree (reference:
ankaflow/models/core.py:44-355 — semantics studied, re-modeled from the
documented YAML schema): a pipeline is an ordered list of stages; each
stage has a kind (source/tap, transform, sink, sql, internal, pipeline),
a name (arbitrary string — the engine mangles it into a temp-view name),
an optional SQL query, an optional connection, and control attributes
(skip_if, show, on_error, throttle, nested stages, explicit fields).
"""

from __future__ import annotations

import enum
import logging
from typing import Any, Dict, List, Optional

import yaml
from pydantic import BaseModel, Field, field_validator

log = logging.getLogger("ankaflow_spark.models")

# unknown stage keys the reference corpus legitimately carries
_KNOWN_STAGE_EXTRAS = frozenset({"attribution", "annotations", "comment", "description", "doc"})


class StageKind(str, enum.Enum):
    source = "source"
    tap = "tap"
    transform = "transform"
    sink = "sink"
    sql = "sql"
    internal = "internal"
    pipeline = "pipeline"
    # beyond-reference: declarative operator stages (dedup, similarity,
    # text analysis, as-of — see ankaflow_spark.operators.registry)
    operator = "operator"
    # beyond-reference: Structured Streaming stage — a real streaming
    # query (readStream + watermarked stateful op, availableNow) whose
    # final result registers as a batch table for downstream stages
    stream = "stream"


class ErrorPolicy(str, enum.Enum):
    fail = "fail"
    # continue is a Python keyword; YAML value stays "continue"
    proceed = "continue"


class Column(BaseModel):
    name: str
    type: str = "VARCHAR"


class ConnectionSpec(BaseModel):
    """Connection config attached to taps/sinks/sql stages.

    ``kind`` selects the connector (parquet/csv/json/file/variable/
    delta/rest/...). ``version`` + ``key`` enable the incremental
    latest-record-wins dedup read (SURVEY.md §2A 'versioned dedup').
    """

    model_config = {"extra": "allow"}

    kind: str = "parquet"
    locator: Optional[str] = None
    fields: Optional[List[Column]] = None
    version: Optional[str] = None
    key: Optional[List[str]] = None
    # file-format options passed to the Spark reader/writer
    options: Dict[str, Any] = Field(default_factory=dict)
    # sink-only: overwrite/append/error
    mode: Optional[str] = None
    partition_by: Optional[List[str]] = None
    single_file: bool = False

    @field_validator("kind", mode="before")
    @classmethod
    def _kind_aliases(cls, v):
        # reference spelling: CamelCase kinds, Deltatable for delta
        aliases = {"deltatable": "delta"}
        low = str(v).lower()
        return aliases.get(low, low)

    def model_post_init(self, __context) -> None:
        # reference spelling: data_mode for the sink write mode
        extra = self.__pydantic_extra__ or {}
        if self.mode is None and extra.get("data_mode"):
            self.mode = extra["data_mode"]
        # reference 0.8.0 spelling: `params` passes arbitrary reader
        # arguments to the underlying reader primitive (changelog.md
        # 0.8.0 "Dynamic File Reader Arguments") — merged under our
        # `options`, which wins on key conflicts
        params = extra.get("params")
        if isinstance(params, dict):
            self.options = {**params, **self.options}


class Stage(BaseModel):
    # tolerant like the reference: unknown stage attributes (attribution,
    # custom annotations) must not reject a pipeline that runs there
    model_config = {"extra": "allow"}

    kind: StageKind
    name: str
    query: Optional[str] = None
    connection: Optional[ConnectionSpec] = None
    skip_if: Optional[Any] = None
    show: int = 0
    show_schema: Optional[bool] = None
    log_level: Optional[str] = None
    on_error: ErrorPolicy = ErrorPolicy.fail
    throttle: float = 0
    explain: bool = False
    stages: Optional["Stages"] = None
    fields: Optional[List[Column]] = None
    # operator stages only
    op: Optional[str] = None
    params: Dict[str, Any] = Field(default_factory=dict)
    input: Optional[str] = None

    @field_validator("name")
    @classmethod
    def _nonempty(cls, v: str) -> str:
        if not v.strip():
            raise ValueError("stage name must be non-empty")
        return v

    @field_validator("stages", mode="before")
    @classmethod
    def _coerce_stages(cls, v):
        if isinstance(v, list):
            return {"root": v}
        return v

    def model_post_init(self, __context) -> None:
        # extra=allow keeps reference-corpus pipelines loading, but a
        # typoed control field (`skipif`, `data_mode` on a tap, ...)
        # silently changing behavior is worse than noise — warn for
        # anything outside the known reference extras.
        unknown = set(self.__pydantic_extra__ or {}) - _KNOWN_STAGE_EXTRAS
        if unknown:
            log.warning(
                "stage %r: ignoring unknown key(s) %s — possible typo? "
                "known fields: %s",
                self.name,
                sorted(unknown),
                sorted(type(self).model_fields),
            )


class Stages(BaseModel):
    """Ordered stage list; the whole pipeline definition."""

    root: List[Stage]

    def __iter__(self):
        return iter(self.root)

    def __len__(self):
        return len(self.root)

    def __getitem__(self, i):
        return self.root[i]

    @classmethod
    def load(cls, path: str) -> "Stages":
        with open(path) as fh:
            data = yaml.safe_load(fh)
        return cls.parse(data)

    @classmethod
    def loads(cls, text: str) -> "Stages":
        return cls.parse(yaml.safe_load(text))

    @classmethod
    def parse(cls, data: Any) -> "Stages":
        if isinstance(data, dict) and "stages" in data:
            data = data["stages"]
        return cls(root=[Stage.model_validate(s) for s in data])


Stage.model_rebuild()
