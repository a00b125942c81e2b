"""Pure-Python Iceberg REST catalog client (stdlib ``urllib`` only).

The reference attaches a REST catalog through DuckDB's iceberg extension
(`backend/main.py:317-358`: ``CREATE SECRET … TOKEN 'key:secret'`` +
``ATTACH … ENDPOINT …``). The wire protocol behind that ATTACH is the
public Apache Iceberg REST catalog spec; this client speaks the handful of
endpoints the service needs —

- ``GET  /v1/config``                                (prefix discovery)
- ``POST /v1/oauth/tokens``                          (client-credentials
  token exchange; the reference's ``key:secret`` token maps to
  client_id:client_secret)
- ``GET  /v1/{prefix}/namespaces``
- ``GET  /v1/{prefix}/namespaces/{ns}/tables``
- ``GET  /v1/{prefix}/namespaces/{ns}/tables/{tbl}`` (LoadTableResult →
  ``metadata-location``)

— so a REST-cataloged table can be LISTED and, when its files are
reachable, READ (handing ``metadata-location`` to
:mod:`cloudfloe_spark.sources.iceberg_meta`) without the Iceberg Spark
runtime jar. When the jar is present the Spark ``type=rest`` catalog path
(`service/engine.py::catalog_options`) is used instead.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request

__all__ = ["RestCatalogClient", "RestCatalogError"]

_TIMEOUT = 10.0


class RestCatalogError(RuntimeError):
    """Catalog endpoint unreachable, unauthorized, or malformed."""

    def __init__(self, message: str, status: int | None = None):
        super().__init__(message)
        self.status = status


class RestCatalogClient:
    """One catalog endpoint + one credential. Token exchange happens at
    construction so an invalid credential fails fast (the connection-test
    UX the reference gets from ATTACH erroring)."""

    def __init__(
        self,
        endpoint: str,
        credential: str | None = None,
        timeout: float = _TIMEOUT,
    ):
        self._base = endpoint.rstrip("/")
        self._timeout = timeout
        self._token: str | None = None
        if credential:
            self._token = self._fetch_token(credential)
        cfg = self._request("GET", "/v1/config")
        # Spec: defaults are catalog-suggested, overrides are mandatory.
        merged = {**cfg.get("defaults", {}), **cfg.get("overrides", {})}
        self._prefix = merged.get("prefix", "")

    # -- wire helpers ------------------------------------------------------

    def _fetch_token(self, credential: str) -> str:
        client_id, _, client_secret = credential.partition(":")
        body = urllib.parse.urlencode(
            {
                "grant_type": "client_credentials",
                "client_id": client_id,
                "client_secret": client_secret,
                "scope": "catalog",
            }
        ).encode("ascii")
        try:
            data = self._raw(
                "POST",
                "/v1/oauth/tokens",
                body=body,
                content_type="application/x-www-form-urlencoded",
            )
        except RestCatalogError as e:
            if e.status == 404:
                # Catalogs without a token endpoint accept the credential
                # as a bearer token directly (DuckDB's TOKEN behaves so).
                return credential
            raise
        token = data.get("access_token")
        if not token:
            raise RestCatalogError("token endpoint returned no access_token")
        return str(token)

    def _raw(
        self,
        method: str,
        path: str,
        body: bytes | None = None,
        content_type: str = "application/json",
    ) -> dict:
        req = urllib.request.Request(
            self._base + path, data=body, method=method
        )
        req.add_header("Accept", "application/json")
        if body is not None:
            req.add_header("Content-Type", content_type)
        if self._token:
            req.add_header("Authorization", f"Bearer {self._token}")
        try:
            with urllib.request.urlopen(req, timeout=self._timeout) as resp:
                payload = resp.read()
        except urllib.error.HTTPError as e:
            raise RestCatalogError(
                f"{method} {path}: HTTP {e.code}", status=e.code
            ) from None
        except (urllib.error.URLError, OSError) as e:
            raise RestCatalogError(f"{method} {path}: {e}") from None
        if not payload:
            return {}
        try:
            return json.loads(payload)
        except ValueError:
            raise RestCatalogError(
                f"{method} {path}: non-JSON response"
            ) from None

    def _request(self, method: str, path: str) -> dict:
        return self._raw(method, path)

    def _scoped(self, tail: str) -> str:
        if self._prefix:
            return f"/v1/{urllib.parse.quote(self._prefix, safe='')}/{tail}"
        return f"/v1/{tail}"

    # -- catalog surface ---------------------------------------------------

    def list_namespaces(self) -> list[str]:
        data = self._request("GET", self._scoped("namespaces"))
        # Multi-level namespaces arrive as string lists; the service only
        # uses single-level names (config.namespace is one identifier).
        return [".".join(ns) for ns in data.get("namespaces", [])]

    def list_tables(self, namespace: str) -> list[str]:
        ns = urllib.parse.quote(namespace, safe="")
        data = self._request("GET", self._scoped(f"namespaces/{ns}/tables"))
        return [t["name"] for t in data.get("identifiers", [])]

    def load_table(self, namespace: str, table: str) -> dict:
        ns = urllib.parse.quote(namespace, safe="")
        tbl = urllib.parse.quote(table, safe="")
        return self._request(
            "GET", self._scoped(f"namespaces/{ns}/tables/{tbl}")
        )

    def metadata_location(self, namespace: str, table: str) -> str:
        data = self.load_table(namespace, table)
        loc = data.get("metadata-location")
        if not loc:
            raise RestCatalogError(
                f"{namespace}.{table}: LoadTableResult has no "
                "metadata-location"
            )
        return str(loc)
