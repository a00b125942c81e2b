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
- ``POST /v1/{prefix}/namespaces/{ns}/tables/{tbl}`` (r10 — the spec's
  COMMIT protocol: a CommitTableRequest of ``requirements`` +
  ``updates``, with ``assert-ref-snapshot-id`` as the CAS; HTTP 409 maps
  to :class:`RestCommitConflict` → the write ops' optimistic retry loop)

— so a REST-cataloged table can be LISTED and, when its files are
reachable, READ (handing ``metadata-location`` to
:mod:`cloudfloe_spark.sources.iceberg_meta`) AND — once bound via
:func:`bind_rest_table` — WRITTEN: every local write op's commit point
(``iceberg_fixture.write_next_metadata_version``) routes through
:func:`commit_table_metadata`, which derives the spec's update list by
diffing the op's computed metadata against the catalog's current state
and POSTs it. The catalog (server) is the one that materializes the new
metadata version and swaps the pointer, exactly the spec's division of
labor. When the jar is present the Spark ``type=rest`` catalog path
(`service/engine.py::catalog_options`) is used instead.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request

__all__ = [
    "RestCatalogClient",
    "RestCatalogError",
    "RestCommitConflict",
    "apply_table_updates",
    "derive_table_updates",
    "bind_rest_table",
    "unbind_rest_table",
    "binding_for",
    "commit_table_metadata",
]

_TIMEOUT = 10.0


class RestCatalogError(RuntimeError):
    """Catalog endpoint unreachable, unauthorized, or malformed."""

    def __init__(self, message: str, status: int | None = None):
        super().__init__(message)
        self.status = status


class RestCommitConflict(RestCatalogError):
    """HTTP 409: a requirement (the ``assert-ref-snapshot-id`` CAS)
    failed — another writer committed first. Mapped to
    ``iceberg_fixture.CommitConflictError`` at the commit seam so the
    maintenance layer's optimistic retry (r10, VERDICT r9 #1) handles
    REST conflicts exactly like local ones."""


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

    def commit_table(
        self,
        namespace: str,
        table: str,
        requirements: list[dict],
        updates: list[dict],
    ) -> dict:
        """The spec's commit protocol (r10): POST a CommitTableRequest.
        The SERVER validates ``requirements`` against its current state
        (``assert-ref-snapshot-id`` is the CAS), applies ``updates``,
        materializes the new metadata version, and returns the new
        ``metadata-location``. HTTP 409 → :class:`RestCommitConflict`."""
        body = json.dumps(
            {
                "identifier": {"namespace": [namespace], "name": table},
                "requirements": requirements,
                "updates": updates,
            }
        ).encode()
        ns = urllib.parse.quote(namespace, safe="")
        tbl = urllib.parse.quote(table, safe="")
        path = self._scoped(f"namespaces/{ns}/tables/{tbl}")
        try:
            return self._raw("POST", path, body=body)
        except RestCatalogError as e:
            if e.status == 409:
                raise RestCommitConflict(
                    f"{namespace}.{table}: commit requirements failed "
                    "(concurrent update)",
                    status=409,
                ) from None
            raise


# --- spec update semantics (shared with any server implementation) -----------


def apply_table_updates(meta: dict, updates: list[dict]) -> dict:
    """Apply a CommitTableRequest's ``updates`` to a metadata dict — the
    server half of the commit protocol (the in-repo HTTP stub uses this
    as its authoritative application; the client uses it to VERIFY that
    the derived update list reproduces the op's computed metadata before
    posting). Supported update types are exactly the ones
    :func:`derive_table_updates` emits."""
    import copy

    out = copy.deepcopy(meta)
    snaps = out.setdefault("snapshots", [])
    by_id = {s.get("snapshot-id"): s for s in snaps}
    for u in updates:
        action = u.get("action")
        if action == "add-snapshot":
            s = u["snapshot"]
            if s.get("snapshot-id") not in by_id:
                snaps.append(copy.deepcopy(s))
                by_id[s.get("snapshot-id")] = s
                # v3 row lineage (r11): next-row-id is SERVER bookkeeping
                # — advance it from the snapshot's assigned id block
                # (first-row-id + assigned-rows summary), mirroring how
                # the spec's catalog maintains the counter on commit
                fr = s.get("first-row-id")
                if fr is not None:
                    assigned = int(
                        (s.get("summary") or {}).get("assigned-rows") or 0
                    )
                    out["next-row-id"] = max(
                        int(out.get("next-row-id") or 0),
                        int(fr) + assigned,
                    )
        elif action == "remove-snapshots":
            gone = set(u.get("snapshot-ids") or [])
            out["snapshots"] = snaps = [
                s for s in snaps if s.get("snapshot-id") not in gone
            ]
            by_id = {s.get("snapshot-id"): s for s in snaps}
            out["snapshot-log"] = [
                e
                for e in out.get("snapshot-log", [])
                if e.get("snapshot-id") not in gone
            ]
        elif action == "set-snapshot-ref":
            name = u["ref-name"]
            sid = u["snapshot-id"]
            if name == "main":
                out["current-snapshot-id"] = sid
                ts = (by_id.get(sid) or {}).get("timestamp-ms")
                log = out.setdefault("snapshot-log", [])
                if ts is not None and not (
                    log and log[-1].get("snapshot-id") == sid
                ):
                    log.append({"snapshot-id": sid, "timestamp-ms": ts})
            refs = out.setdefault("refs", {})
            ref = {"snapshot-id": sid, "type": u.get("type", "branch")}
            for k in (
                "min-snapshots-to-keep",
                "max-snapshot-age-ms",
                "max-ref-age-ms",
            ):
                if u.get(k) is not None:
                    ref[k] = u[k]
            refs[name] = ref
        elif action == "remove-snapshot-ref":
            (out.get("refs") or {}).pop(u["ref-name"], None)
        elif action == "upgrade-format-version":
            new_fv = int(u["format-version"])
            cur_fv = int(out.get("format-version") or 1)
            if new_fv < cur_fv:
                raise RestCatalogError(
                    f"cannot downgrade format-version {cur_fv}→{new_fv}"
                )
            out["format-version"] = new_fv
        elif action == "set-properties":
            out.setdefault("properties", {}).update(u.get("updates") or {})
        elif action == "remove-properties":
            props = out.setdefault("properties", {})
            for k in u.get("removals") or []:
                props.pop(k, None)
        elif action == "set-statistics":
            # spec: one StatisticsFile per snapshot — setting replaces
            stat = u["statistics"]
            sid = stat.get("snapshot-id")
            out["statistics"] = [
                e
                for e in out.get("statistics") or []
                if e.get("snapshot-id") != sid
            ] + [stat]
        elif action == "remove-statistics":
            out["statistics"] = [
                e
                for e in out.get("statistics") or []
                if e.get("snapshot-id") != u["snapshot-id"]
            ]
            if not out["statistics"]:
                out.pop("statistics", None)
        elif action == "set-partition-statistics":
            stat = u["partition-statistics"]
            sid = stat.get("snapshot-id")
            out["partition-statistics"] = [
                e
                for e in out.get("partition-statistics") or []
                if e.get("snapshot-id") != sid
            ] + [stat]
        elif action == "remove-partition-statistics":
            out["partition-statistics"] = [
                e
                for e in out.get("partition-statistics") or []
                if e.get("snapshot-id") != u["snapshot-id"]
            ]
            if not out["partition-statistics"]:
                out.pop("partition-statistics", None)
        else:
            raise RestCatalogError(
                f"unsupported table update action {action!r}"
            )
    if snaps:
        out["last-sequence-number"] = max(
            int(s.get("sequence-number") or 0) for s in snaps
        )
    return out


def _norm_for_compare(meta: dict) -> dict:
    """Metadata with server-side bookkeeping fields dropped, for the
    pre-post verification diff (the server recomputes these)."""
    out = {
        k: v
        for k, v in meta.items()
        if k
        not in (
            "last-updated-ms",
            "metadata-log",
            "last-sequence-number",
            "snapshot-log",  # maintained by set-snapshot-ref application
            "next-row-id",  # v3 row lineage: advanced on add-snapshot
        )
    }
    # refs: main mirrors current-snapshot-id; normalize its presence
    refs = dict(out.get("refs") or {})
    cur = out.get("current-snapshot-id")
    if cur is not None:
        refs.setdefault("main", {"snapshot-id": cur, "type": "branch"})
    out["refs"] = refs
    return out


def derive_table_updates(
    before: dict, after: dict
) -> tuple[list[dict], list[dict]]:
    """Diff two metadata states into the spec's (requirements, updates).
    ``before`` is the CATALOG's current metadata, ``after`` the state the
    local op computed. Raises :class:`RestCatalogError` when the change
    is not expressible in the supported update set (verified by applying
    the derived updates to ``before`` and comparing — a silent partial
    commit is never possible). The requirements pin the table uuid and
    main's snapshot id as read: the spec's optimistic CAS."""
    requirements: list[dict] = []
    if before.get("table-uuid"):
        requirements.append(
            {"type": "assert-table-uuid", "uuid": before["table-uuid"]}
        )
    requirements.append(
        {
            "type": "assert-ref-snapshot-id",
            "ref": "main",
            "snapshot-id": before.get("current-snapshot-id"),
        }
    )

    updates: list[dict] = []
    b_fv = int(before.get("format-version") or 1)
    a_fv = int(after.get("format-version") or 1)
    if a_fv > b_fv:
        # the spec's upgrade action — a v3 deletion-vector commit on a
        # bound v2 table advances the format in the same commit (r10)
        updates.append(
            {"action": "upgrade-format-version", "format-version": a_fv}
        )
    before_ids = {
        s.get("snapshot-id") for s in before.get("snapshots", [])
    }
    after_snaps = after.get("snapshots", [])
    after_ids = {s.get("snapshot-id") for s in after_snaps}
    for s in after_snaps:
        if s.get("snapshot-id") not in before_ids:
            updates.append({"action": "add-snapshot", "snapshot": s})
    removed = sorted(
        i for i in before_ids if i not in after_ids and i is not None
    )
    if removed:
        updates.append(
            {"action": "remove-snapshots", "snapshot-ids": removed}
        )
    if after.get("current-snapshot-id") != before.get(
        "current-snapshot-id"
    ) and after.get("current-snapshot-id") is not None:
        updates.append(
            {
                "action": "set-snapshot-ref",
                "ref-name": "main",
                "snapshot-id": after["current-snapshot-id"],
                "type": "branch",
            }
        )
    b_refs = dict(before.get("refs") or {})
    a_refs = dict(after.get("refs") or {})
    for name, ref in a_refs.items():
        if name == "main":
            continue  # main handled via current-snapshot-id above
        if b_refs.get(name) != ref:
            upd = {
                "action": "set-snapshot-ref",
                "ref-name": name,
                "snapshot-id": ref.get("snapshot-id"),
                "type": ref.get("type", "branch"),
            }
            updates.append(upd)
    for name in b_refs:
        if name != "main" and name not in a_refs:
            updates.append(
                {"action": "remove-snapshot-ref", "ref-name": name}
            )
    b_props = dict(before.get("properties") or {})
    a_props = dict(after.get("properties") or {})
    changed = {k: v for k, v in a_props.items() if b_props.get(k) != v}
    if changed:
        updates.append({"action": "set-properties", "updates": changed})
    gone = sorted(k for k in b_props if k not in a_props)
    if gone:
        updates.append({"action": "remove-properties", "removals": gone})
    # statistics (r12, spec set-statistics/remove-statistics): ANALYZE
    # registers a StatisticsFile; expire_snapshots drops entries for
    # expired snapshots. One entry per snapshot id (set replaces).
    b_stats = {
        e.get("snapshot-id"): e for e in before.get("statistics") or []
    }
    a_stats = {
        e.get("snapshot-id"): e for e in after.get("statistics") or []
    }
    for sid, e in a_stats.items():
        if b_stats.get(sid) != e:
            updates.append(
                {
                    "action": "set-statistics",
                    "snapshot-id": sid,
                    "statistics": e,
                }
            )
    for sid in b_stats:
        if sid not in a_stats:
            updates.append(
                {"action": "remove-statistics", "snapshot-id": sid}
            )
    b_pstats = {
        e.get("snapshot-id"): e
        for e in before.get("partition-statistics") or []
    }
    a_pstats = {
        e.get("snapshot-id"): e
        for e in after.get("partition-statistics") or []
    }
    for sid, e in a_pstats.items():
        if b_pstats.get(sid) != e:
            updates.append(
                {
                    "action": "set-partition-statistics",
                    "partition-statistics": e,
                }
            )
    for sid in b_pstats:
        if sid not in a_pstats:
            updates.append(
                {
                    "action": "remove-partition-statistics",
                    "snapshot-id": sid,
                }
            )

    reconstructed = apply_table_updates(before, updates)
    if _norm_for_compare(reconstructed) != _norm_for_compare(after):
        raise RestCatalogError(
            "metadata change is not expressible as REST table updates "
            "(schema/spec evolution through the catalog is not supported "
            "— commit those locally before binding)"
        )
    return requirements, updates


# --- root → catalog-table binding (the write seam) ----------------------------

_BINDINGS: dict[str, tuple["RestCatalogClient", str, str]] = {}


def _norm_root(root: str) -> str:
    import os

    return os.path.realpath(root.removeprefix("file://"))


def bind_rest_table(
    root: str, client: "RestCatalogClient", namespace: str, table: str
) -> None:
    """Route every subsequent commit on ``root`` (the shared commit
    point ``iceberg_fixture.write_next_metadata_version``) through the
    catalog's POST commit protocol — DML, compaction, matview refresh
    stamps, ref/rollback/expire all become catalog-validated commits."""
    _BINDINGS[_norm_root(root)] = (client, namespace, table)


def unbind_rest_table(root: str) -> None:
    _BINDINGS.pop(_norm_root(root), None)


def binding_for(root: str):
    return _BINDINGS.get(_norm_root(root))


def commit_table_metadata(binding, root: str, after_meta: dict) -> str:
    """Commit an op's computed metadata state through the REST catalog:
    load the catalog's CURRENT metadata, diff → (requirements, updates),
    POST, and return the server-materialized metadata-location (as a
    local path when file-served). A 409 surfaces as
    ``iceberg_fixture.CommitConflictError`` so the optimistic retry loop
    treats catalog conflicts exactly like local CAS conflicts."""
    from cloudfloe_spark.sources import iceberg_meta as im
    from cloudfloe_spark.sources.iceberg_fixture import CommitConflictError

    client, namespace, table = binding
    loc = client.metadata_location(namespace, table)
    before = im.load_metadata(root, im._relocate(loc, _norm_root(root)))
    requirements, updates = derive_table_updates(before, after_meta)
    try:
        resp = client.commit_table(namespace, table, requirements, updates)
    except RestCommitConflict as e:
        raise CommitConflictError(
            f"{namespace}.{table}: REST catalog rejected the commit "
            f"({e}); re-resolve and retry"
        ) from None
    new_loc = resp.get("metadata-location")
    if not new_loc:
        raise RestCatalogError(
            f"{namespace}.{table}: commit response has no "
            "metadata-location"
        )
    return str(new_loc).removeprefix("file://")
