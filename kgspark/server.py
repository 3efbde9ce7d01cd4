"""REST serving surface — the engine-API-over-HTTP shim the reference
ships as a FastAPI app (server/graph_service/routers/ingest.py,
retrieve.py; rounds 1-3 accepted it as out of scope because every route
is a thin wrapper over the engine API that ``KGSpark`` mirrors 1:1 —
this closes the gap with the same thin wrapper on stdlib
``http.server``, no web-framework dependency).

Routes (reference parity, same paths/semantics):

- ``POST /messages``              {group_id, messages:[{content, name?,
  role?, timestamp?}]} → ingest each as an episode (ingest.py:65-100;
  the reference queues these through its AsyncWorker — here the ingest
  runs synchronously and the response reports counts).
- ``POST /search``                {query, group_ids?, max_results?,
  center_node_uuid?} → fact results from edge hybrid search
  (retrieve.py:39-56).
- ``GET  /episodes/{group_id}?last_n=N`` → last-n episodes
  (retrieve.py:93-99).
- ``POST /get-memory``            {group_id, messages:[...], max_facts?}
  → facts relevant to the composed message query (retrieve.py:101-117).
- ``DELETE /group/{group_id}``    (ingest.py:123-127)
- ``DELETE /episode/{uuid}``      cascading delete (ingest.py:129-133)
- ``POST /clear``                 drop every group (ingest.py:135-141)
- ``GET  /healthcheck``           (main.py)

Single-threaded ``HTTPServer`` by design: one SparkSession serves one
driver; concurrent query execution belongs to Spark's scheduler, not to
HTTP worker threads (the reference serializes ingest through its queue
for the same reason). The MCP adapter (``kgspark/mcp.py``, stdio
JSON-RPC — protocol hand-rolled, no SDK dependency) wraps these same
engine calls.
"""

from __future__ import annotations

import json
import re
from datetime import datetime
from http.server import BaseHTTPRequestHandler, HTTPServer

from kgspark.api import KGSpark


def _json_default(o):
    if isinstance(o, datetime):
        return o.isoformat()
    if isinstance(o, (bytes, bytearray)):
        return o.hex()
    return str(o)


def _rows(df, limit: int = 1000) -> list[dict]:
    return [r.asDict(recursive=True) for r in df.limit(limit).collect()]


def _parse_ts(v):
    return datetime.fromisoformat(v) if isinstance(v, str) else None


class _Handler(BaseHTTPRequestHandler):
    kg: KGSpark  # injected by serve()

    # ------------------------------------------------------------ plumbing
    def _reply(self, status: int, payload: dict) -> None:
        body = json.dumps(payload, default=_json_default).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _body(self) -> dict:
        n = int(self.headers.get("Content-Length") or 0)
        return json.loads(self.rfile.read(n) or b"{}")

    def log_message(self, *a):  # quiet: tests drive hundreds of requests
        pass

    def _route(self, method: str) -> None:
        try:
            handler = self._match(method)
            if handler is None:
                self._reply(404, {"error": f"no route {method} {self.path}"})
                return
            handler()
        except (ValueError, KeyError) as e:
            self._reply(400, {"error": str(e)})
        except Exception as e:  # surface engine errors as 500 JSON
            self._reply(500, {"error": f"{type(e).__name__}: {e}"})

    def _match(self, method: str):
        path = self.path.split("?")[0].rstrip("/")
        routes = {
            ("POST", "/messages"): self._post_messages,
            ("POST", "/search"): self._post_search,
            ("POST", "/get-memory"): self._post_get_memory,
            ("POST", "/clear"): self._post_clear,
            ("GET", "/healthcheck"): lambda: self._reply(200, {"status": "healthy"}),
        }
        if (method, path) in routes:
            return routes[(method, path)]
        if m := re.fullmatch(r"/episodes/([^/]+)", path):
            if method == "GET":
                return lambda: self._get_episodes(m.group(1))
        if m := re.fullmatch(r"/group/([^/]+)", path):
            if method == "DELETE":
                return lambda: self._delete_group(m.group(1))
        if m := re.fullmatch(r"/episode/([^/]+)", path):
            if method == "DELETE":
                return lambda: self._delete_episode(m.group(1))
        return None

    def do_GET(self):  # noqa: N802
        self._route("GET")

    def do_POST(self):  # noqa: N802
        self._route("POST")

    def do_DELETE(self):  # noqa: N802
        self._route("DELETE")

    # -------------------------------------------------------------- ingest
    def _post_messages(self) -> None:
        q = self._body()
        group_id = q["group_id"]
        results = []
        for i, msg in enumerate(q["messages"]):
            body = msg["content"]
            if msg.get("role"):  # reference formats "role: content"
                body = f"{msg['role']}: {body}"
            counts = self.kg.add_episode(
                name=msg.get("name") or f"msg-{group_id}-{i}",
                episode_body=body,
                source_description=msg.get("source_description", ""),
                reference_time=_parse_ts(msg.get("timestamp")),
                group_id=group_id,
            )
            results.append(counts)
        self._reply(202, {"message": "Messages added to processing queue",
                          "results": results})

    def _post_clear(self) -> None:
        eps = self.kg.store.read(self.kg.spark, "episodes") \
            if self.kg.store.exists("episodes") else None
        groups = ([r["group_id"] for r in
                   eps.select("group_id").distinct().collect()]
                  if eps is not None else [])
        if groups:
            self.kg.delete_group(groups)
        self._reply(200, {"message": "graph cleared", "groups": groups})

    def _delete_group(self, group_id: str) -> None:
        self.kg.delete_group([group_id])
        self._reply(200, {"message": f"Group {group_id} deleted"})

    def _delete_episode(self, uuid: str) -> None:
        from pyspark.sql import functions as F

        found = (self.kg.store.exists("episodes")
                 and bool(self.kg.store.read(self.kg.spark, "episodes")
                          .where(F.col("uuid") == uuid).take(1)))
        if not found:
            self._reply(404, {"error": f"episode {uuid} not found"})
            return
        self.kg.remove_episode(uuid)
        self._reply(200, {"message": f"Episode {uuid} deleted"})

    # ------------------------------------------------------------ retrieve
    def _post_search(self) -> None:
        q = self._body()
        df = self.kg.search(
            query=q["query"],
            group_ids=q.get("group_ids"),
            center_node_uuid=q.get("center_node_uuid"),
            num_results=int(q.get("max_results", 10)),
        )
        facts = [
            {"uuid": r["uuid"], "name": r["name"], "fact": r["fact"],
             "valid_at": r["valid_at"], "invalid_at": r["invalid_at"],
             "created_at": r.get("created_at"), "expired_at": r.get("expired_at")}
            for r in _rows(df)
        ]
        self._reply(200, {"facts": facts})

    def _get_episodes(self, group_id: str) -> None:
        from urllib.parse import parse_qs, urlparse

        qs = parse_qs(urlparse(self.path).query)
        last_n = int(qs.get("last_n", ["3"])[0])
        df = self.kg.retrieve_episodes(
            reference_time=datetime.max, last_n=last_n, group_ids=[group_id])
        self._reply(200, {"episodes": _rows(df)})

    def _post_get_memory(self) -> None:
        q = self._body()
        combined = " ".join(
            f"{m.get('role', '')}: {m['content']}".strip(": ")
            for m in q["messages"])
        df = self.kg.search(query=combined,
                            group_ids=[q["group_id"]],
                            num_results=int(q.get("max_facts", 10)))
        facts = [{"uuid": r["uuid"], "name": r["name"], "fact": r["fact"],
                  "valid_at": r["valid_at"], "invalid_at": r["invalid_at"]}
                 for r in _rows(df)]
        self._reply(200, {"facts": facts})


def serve(kg: KGSpark, host: str = "127.0.0.1", port: int = 0) -> HTTPServer:
    """Bind (port 0 = ephemeral) and return the server; the caller calls
    ``serve_forever()`` (or drives ``handle_request()`` in tests)."""
    handler = type("BoundHandler", (_Handler,), {"kg": kg})
    return HTTPServer((host, port), handler)


def main() -> None:
    import sys

    from kgspark.session import get_spark

    store_root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/kgspark-store"
    port = int(sys.argv[2]) if len(sys.argv) > 2 else 8000
    spark = get_spark("kgspark-server", master="local[8]",
                      shuffle_partitions=8)
    srv = serve(KGSpark(spark, store_root), port=port)
    print(f"kgspark serving on http://127.0.0.1:{srv.server_port}")
    srv.serve_forever()


if __name__ == "__main__":
    main()
