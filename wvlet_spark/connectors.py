"""Remote profile connectors.

The reference ships network catalog profiles (TrinoConnector.scala speaks
the public Trino REST protocol; SourceTableStaging.scala moves foreign
tables into run-scoped staging tables).  This module is the Spark-side
counterpart: a minimal stdlib-only Trino protocol client plus a profile
resolver that plugs into WvletSession's existing connector staging —
`from <prefix>.<table>` fetches the table ONCE per statement and lands it
as a ULID-suffixed temp view (one fetch per statement, run-scoped
isolation: the same guarantees the reference's QueryExecutor staging
provides).

Protocol notes (public Trino client REST API):
- POST /v1/statement with the SQL as the body and X-Trino-User /
  X-Trino-Catalog / X-Trino-Schema headers starts a query.
- Each response carries optional `columns` + `data` batches and a
  `nextUri`; the client polls until `nextUri` disappears.  `error` aborts.
- Data values arrive JSON-typed; temporal types arrive as strings.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request


class RemoteConnectorError(RuntimeError):
    pass


class TrinoHttpClient:
    """Tiny Trino REST protocol client (stdlib only — the environment is
    dependency-frozen, and the protocol is three HTTP verbs)."""

    def __init__(self, host: str, port: int = 8080, user: str = "wvlet",
                 catalog: str | None = None, schema: str | None = None,
                 scheme: str = "http", poll_interval: float = 0.05,
                 max_polls: int = 600):
        self.base = f"{scheme}://{host}:{port}"
        self.user = user
        self.catalog = catalog
        self.schema = schema
        self.poll_interval = poll_interval
        self.max_polls = max_polls

    def _request(self, url: str, body: bytes | None = None) -> dict:
        headers = {"X-Trino-User": self.user}
        if self.catalog:
            headers["X-Trino-Catalog"] = self.catalog
        if self.schema:
            headers["X-Trino-Schema"] = self.schema
        req = urllib.request.Request(url, data=body, headers=headers,
                                     method="POST" if body else "GET")
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                return json.loads(resp.read().decode("utf-8"))
        except urllib.error.URLError as ex:
            raise RemoteConnectorError(f"trino request failed: {ex}") from ex

    def execute(self, sql: str) -> tuple[list[dict], list[list]]:
        """Run `sql`, following nextUri pages to completion.
        Returns (columns, rows) — columns are Trino column descriptors
        ({name, type}), rows are JSON-decoded value lists."""
        payload = self._request(self.base + "/v1/statement",
                                sql.encode("utf-8"))
        columns: list[dict] = []
        rows: list[list] = []
        polls = 0
        while True:
            if payload.get("error"):
                msg = payload["error"].get("message", str(payload["error"]))
                raise RemoteConnectorError(f"trino query failed: {msg}")
            if payload.get("columns"):
                columns = payload["columns"]
            if payload.get("data"):
                rows.extend(payload["data"])
            next_uri = payload.get("nextUri")
            if not next_uri:
                return columns, rows
            polls += 1
            if polls > self.max_polls:
                raise RemoteConnectorError("trino query poll limit exceeded")
            if self.poll_interval:
                time.sleep(self.poll_interval)
            payload = self._request(next_uri)


# Trino type name (before any parameters) -> Spark SQL type
_TRINO_SPARK_TYPES = {
    "boolean": "boolean",
    "tinyint": "tinyint", "smallint": "smallint",
    "integer": "int", "int": "int", "bigint": "bigint",
    "real": "float", "double": "double",
    "varchar": "string", "char": "string", "varbinary": "binary",
    "json": "string", "uuid": "string", "ipaddress": "string",
    "date": "date", "timestamp": "timestamp",
}


def _spark_type(trino_type: str) -> str:
    base = trino_type.split("(")[0].strip().lower()
    if base == "decimal":
        return trino_type.lower()
    if base.startswith("timestamp"):
        return "timestamp"
    return _TRINO_SPARK_TYPES.get(base, "string")


def trino_table_reader(client: TrinoHttpClient, table: str):
    """-> fn(spark) -> DataFrame reading `table` via the Trino protocol.
    The function is invoked by the session's connector staging at most
    once per statement (SourceTableStaging semantics)."""
    qualified = ".".join(
        '"' + part.replace('"', '""') + '"' for part in table.split("."))

    def fn(spark):
        import datetime

        columns, rows = client.execute(f"SELECT * FROM {qualified}")
        if not columns:
            raise RemoteConnectorError(
                f"trino returned no schema for {table}")
        fields = ", ".join(
            f"`{c['name']}` {_spark_type(c.get('type', 'varchar'))}"
            for c in columns)
        types = [_spark_type(c.get("type", "varchar")) for c in columns]
        conv = []
        for row in rows:
            vals = []
            for v, t in zip(row, types):
                if v is not None and t == "date":
                    v = datetime.date.fromisoformat(v)
                elif v is not None and t == "timestamp":
                    v = datetime.datetime.fromisoformat(v)
                vals.append(v)
            conv.append(tuple(vals))
        return spark.createDataFrame(conv, schema=fields)

    return fn
