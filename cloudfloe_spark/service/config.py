"""API-boundary models (SURVEY.md §1.5): connection config, query
request/response, table probe info.

Port of the reference's Pydantic layer (`backend/main.py:148-259`) with the
same field names, defaults, and allowlist validators, so clients of the
reference can switch without payload changes. Two deliberate extensions:

- ``storageType`` additionally accepts ``"local"`` and ``tablePath``
  accepts ``file://`` / absolute paths, so the engine is usable and
  testable against local warehouses (the reference is S3-only,
  `backend/main.py:125,149`).
- ``QueryStats.bytesScanned`` is real scan input (sum of input-file sizes)
  rather than the reference's ``len(str(rows))*2`` estimate
  (`backend/main.py:594-595`) — SURVEY.md §4.2 item (b).
"""

from __future__ import annotations

from typing import Any, Literal, Optional

from pydantic import BaseModel, Field, field_validator

from cloudfloe_spark.service.validation import (
    ENDPOINT_RE,
    REGION_RE,
    SESSION_TOKEN_RE,
    SQL_IDENT_RE,
    TABLE_PATH_RE,
    URL_RE,
    require_match,
)

MAX_ROW_LIMIT = 10000  # backend/main.py:228
DEFAULT_ROW_LIMIT = 1000


class ConnectionConfig(BaseModel):
    """Per-request storage + catalog configuration (`backend/main.py:148-218`)."""

    storageType: Literal["s3", "r2", "minio", "local"]
    endpoint: str = ""
    accessKey: str = ""
    secretKey: str = ""
    sessionToken: Optional[str] = None
    region: str = "us-east-1"

    catalogType: Literal["none", "rest", "glue"] = "none"
    catalogEndpoint: Optional[str] = None
    namespace: Optional[str] = "default"
    tablePath: Optional[str] = None

    @field_validator("endpoint")
    @classmethod
    def _validate_endpoint(cls, v: str) -> str:
        if v == "":
            return v
        return require_match(v, ENDPOINT_RE, "endpoint")

    @field_validator("region")
    @classmethod
    def _validate_region(cls, v: str) -> str:
        return require_match(v, REGION_RE, "region")

    @field_validator("accessKey", "secretKey")
    @classmethod
    def _validate_key(cls, v: str, info) -> str:
        # Credentials may contain chars that need escaping; interpolation
        # safety comes from conf-property binding / sql_string_literal.
        # Guard only against obvious smuggling (backend/main.py:180-186).
        if "\x00" in v or "\n" in v or "\r" in v:
            raise ValueError(f"{info.field_name} contains invalid characters")
        return v

    @field_validator("sessionToken")
    @classmethod
    def _validate_session_token(cls, v: Optional[str]) -> Optional[str]:
        if not v:
            return v
        return require_match(v, SESSION_TOKEN_RE, "sessionToken")

    @field_validator("catalogEndpoint")
    @classmethod
    def _validate_catalog_endpoint(cls, v: Optional[str]) -> Optional[str]:
        if not v:
            return v
        return require_match(v, URL_RE, "catalogEndpoint")

    @field_validator("namespace")
    @classmethod
    def _validate_namespace(cls, v: Optional[str]) -> Optional[str]:
        if not v:
            return v
        return require_match(v, SQL_IDENT_RE, "namespace")

    @field_validator("tablePath")
    @classmethod
    def _validate_table_path(cls, v: Optional[str]) -> Optional[str]:
        if not v:
            return v
        # Normalize so downstream code sees a canonical table root
        # (backend/main.py:209-218: strip trailing '/' and '/metadata').
        v = v.rstrip("/")
        if v.endswith("/metadata"):
            v = v[: -len("/metadata")]
        return require_match(v, TABLE_PATH_RE, "tablePath")


class TestConnectionRequest(BaseModel):
    connection: ConnectionConfig


class QueryRequest(BaseModel):
    sql: str
    connection: ConnectionConfig
    rowLimit: int = Field(default=DEFAULT_ROW_LIMIT, le=MAX_ROW_LIMIT)


class MaintenanceRequest(BaseModel):
    """``POST /api/maintenance/compact`` payload — beyond the reference,
    which only ADVISES compaction in its delete-guard 400
    (`backend/main.py:405-413`). Write access is opt-in via
    ``CLOUDFLOE_ENABLE_MAINTENANCE=1``; default is the reference's
    read-only posture."""

    connection: ConnectionConfig
    # 1 MiB..1 GiB: below splits metadata into confetti, above starves
    # executor-task parallelism.
    targetFileBytes: int = Field(
        default=128 * 1024 * 1024, ge=1024 * 1024, le=1024 * 1024 * 1024
    )


class QueryStats(BaseModel):
    executionTimeMs: int
    bytesScanned: int
    rowsReturned: int


class QueryResponse(BaseModel):
    columns: list[str]
    rows: list[list[Any]]
    stats: QueryStats
    truncated: bool = False


class TableInfo(BaseModel):
    """Structured metadata from a successful connection probe
    (`backend/main.py:244-259`); optional fields support both the rich
    direct-path probe and thinner catalog/demo cases."""

    path: str
    suggestedQuery: str
    format: Optional[str] = None
    rows: Optional[int] = None
    files: Optional[int] = None
    hasDeletes: Optional[bool] = None
    snapshotId: Optional[str] = None  # stringified: 64-bit vs JS precision
    lastSnapshotAt: Optional[str] = None  # ISO-8601 UTC
