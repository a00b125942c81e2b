"""ConnectionConfig boundary tests — ports
`backend/tests/test_connection_config.py` behaviors."""

from __future__ import annotations

import pytest
from pydantic import ValidationError

from cloudfloe_spark.service.config import ConnectionConfig, QueryRequest


def _cfg(**kw):
    base = dict(storageType="s3", endpoint="s3.amazonaws.com", accessKey="k", secretKey="s")
    base.update(kw)
    return ConnectionConfig(**base)


def test_valid_minimal():
    c = _cfg()
    assert c.region == "us-east-1" and c.catalogType == "none"


def test_unknown_storage_type_rejected():
    with pytest.raises(ValidationError):
        _cfg(storageType="ftp")


def test_unknown_catalog_type_rejected():
    with pytest.raises(ValidationError):
        _cfg(catalogType="hive")


@pytest.mark.parametrize(
    "bad",
    [
        "s3://bucket/path'; DROP TABLE x; --",
        "s3://bucket/pa th",
        "s3://bucket/path;x",
        "notascheme://bucket/path",
    ],
)
def test_table_path_injection_rejected(bad):
    with pytest.raises(ValidationError):
        _cfg(tablePath=bad)


def test_table_path_trailing_slash_stripped():
    assert _cfg(tablePath="s3://b/t/").tablePath == "s3://b/t"


def test_table_path_metadata_suffix_stripped():
    assert _cfg(tablePath="s3://b/t/metadata").tablePath == "s3://b/t"


def test_table_path_local_accepted():
    # Port extension: local warehouses (documented in config.py)
    assert _cfg(storageType="local", tablePath="/data/w/t").tablePath == "/data/w/t"
    assert _cfg(tablePath="file:///data/w/t").tablePath == "file:///data/w/t"


@pytest.mark.parametrize("bad", ["my namespace", "ns;drop", "1leading", "a-b"])
def test_namespace_must_be_sql_identifier(bad):
    with pytest.raises(ValidationError):
        _cfg(namespace=bad)


def test_namespace_valid():
    assert _cfg(namespace="analytics_01").namespace == "analytics_01"


@pytest.mark.parametrize("bad", ["us east", "region;1", "ré-gion"])
def test_region_charset(bad):
    with pytest.raises(ValidationError):
        _cfg(region=bad)


@pytest.mark.parametrize("field", ["accessKey", "secretKey"])
@pytest.mark.parametrize("bad", ["a\nb", "a\x00b", "a\rb"])
def test_credentials_reject_newline_nul(field, bad):
    with pytest.raises(ValidationError):
        _cfg(**{field: bad})


def test_credentials_allow_special_chars():
    # AWS secrets legitimately contain + / = (reference main.py:180-186)
    assert _cfg(secretKey="ab+/=cd").secretKey == "ab+/=cd"


@pytest.mark.parametrize("bad", ["ftp://cat", "not a url", "https://cat;x"])
def test_catalog_endpoint_must_be_http(bad):
    with pytest.raises(ValidationError):
        _cfg(catalogType="rest", catalogEndpoint=bad)


def test_session_token_charset():
    assert _cfg(sessionToken="abc+/=-_.").sessionToken == "abc+/=-_."
    with pytest.raises(ValidationError):
        _cfg(sessionToken="bad token")


def test_row_limit_capped_at_10000():
    c = _cfg()
    with pytest.raises(ValidationError):
        QueryRequest(sql="SELECT 1", connection=c, rowLimit=10001)
    assert QueryRequest(sql="SELECT 1", connection=c).rowLimit == 1000
