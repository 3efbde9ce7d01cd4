"""MCP serving surface — a stdio JSON-RPC 2.0 adapter exposing the same
tool set as the reference's MCP server (mcp_server/
graphiti_mcp_server.py:653-1115), stdlib-only (the ``mcp`` SDK is not in
this container; the protocol layer it provides — newline-delimited
JSON-RPC over stdio with ``initialize`` / ``tools/list`` / ``tools/call``
— is small enough to speak directly).

Tools (reference parity, same names/arguments):

- ``add_episode``        name, episode_body, group_id?, source?,
  source_description? (graphiti_mcp_server.py:653-791). The engine's
  episode uuid is deterministic sha1(url) (S1 contract), so the
  reference's optional caller-supplied ``uuid`` is rejected rather than
  silently ignored; ``source`` is advisory — the deterministic
  ``detect_source`` classifier governs (operators/extract.py:59).
- ``search_nodes``       query, group_ids?, max_nodes?,
  center_node_uuid?, entity? (:794-872) → node summaries.
- ``search_facts``       query, group_ids?, max_facts?,
  center_node_uuid? (:875-922) → hydrated fact rows.
- ``delete_entity_edge`` uuid (:925-952)
- ``delete_episode``     uuid, cascading (:955-982)
- ``get_entity_edge``    uuid (:985-1013)
- ``get_episodes``       group_id?, last_n? (:1016-1063)
- ``clear_graph``        (:1066-1089)

Resource ``kgspark://status`` mirrors the reference's ``get_status``
resource (:1092-1115).

Transport: one JSON-RPC message per line on stdin/stdout (the MCP stdio
framing). ``MCPServer.handle`` is transport-free so tests drive it
in-process against a real SparkSession; ``serve_stdio`` adds the line
loop. Run: ``python -m kgspark.mcp <store_root>``.
"""

from __future__ import annotations

import json
from dataclasses import replace
from datetime import datetime
from typing import Any, TextIO

from kgspark.api import KGSpark

PROTOCOL_VERSION = "2024-11-05"
STATUS_URI = "kgspark://status"

# JSON Schema fragments shared by several tools
_S = {"type": "string"}
_GROUPS = {"type": "array", "items": {"type": "string"}}

TOOLS: list[dict[str, Any]] = [
    {
        "name": "add_episode",
        "description": "Add an episode to the knowledge graph. Primary "
                       "way to add information; episodes in one group are "
                       "processed sequentially.",
        "inputSchema": {
            "type": "object",
            "properties": {
                "name": _S,
                "episode_body": _S,
                "group_id": _S,
                "source": {"type": "string",
                           "enum": ["text", "json", "message"]},
                "source_description": _S,
                "timestamp": {"type": "string", "format": "date-time"},
            },
            "required": ["name", "episode_body"],
        },
    },
    {
        "name": "search_nodes",
        "description": "Search the graph for relevant node summaries.",
        "inputSchema": {
            "type": "object",
            "properties": {
                "query": _S,
                "group_ids": _GROUPS,
                "max_nodes": {"type": "integer"},
                "center_node_uuid": _S,
                "entity": _S,
            },
            "required": ["query"],
        },
    },
    {
        "name": "search_facts",
        "description": "Search the graph for relevant facts (entity edges).",
        "inputSchema": {
            "type": "object",
            "properties": {
                "query": _S,
                "group_ids": _GROUPS,
                "max_facts": {"type": "integer"},
                "center_node_uuid": _S,
            },
            "required": ["query"],
        },
    },
    {
        "name": "delete_entity_edge",
        "description": "Delete an entity edge by uuid.",
        "inputSchema": {"type": "object", "properties": {"uuid": _S},
                        "required": ["uuid"]},
    },
    {
        "name": "delete_episode",
        "description": "Delete an episode by uuid (cascading).",
        "inputSchema": {"type": "object", "properties": {"uuid": _S},
                        "required": ["uuid"]},
    },
    {
        "name": "get_entity_edge",
        "description": "Get an entity edge by uuid.",
        "inputSchema": {"type": "object", "properties": {"uuid": _S},
                        "required": ["uuid"]},
    },
    {
        "name": "get_episodes",
        "description": "Get the most recent episodes for a group.",
        "inputSchema": {
            "type": "object",
            "properties": {"group_id": _S, "last_n": {"type": "integer"}},
            "required": ["group_id"],
        },
    },
    {
        "name": "clear_graph",
        "description": "Clear all data from the knowledge graph.",
        "inputSchema": {"type": "object", "properties": {}},
    },
]


def _json_default(o):
    if isinstance(o, datetime):
        return o.isoformat()
    if isinstance(o, (bytes, bytearray)):
        return o.hex()
    return str(o)


def _rows(df, limit: int = 1000) -> list[dict]:
    return [r.asDict(recursive=True) for r in df.limit(limit).collect()]


def _fact(row: dict) -> dict:
    """format_fact_result parity (graphiti_mcp_server.py:593-616):
    the edge record minus its embedding vector."""
    return {k: v for k, v in row.items() if k != "fact_embedding"}


class MCPServer:
    """Transport-free MCP request handler over one ``KGSpark`` engine."""

    def __init__(self, kg: KGSpark):
        self.kg = kg

    # ------------------------------------------------------------- dispatch
    def handle(self, msg: dict) -> dict | None:
        """One JSON-RPC message in, one response dict out (None for
        notifications, which take no response)."""
        method = msg.get("method", "")
        msg_id = msg.get("id")
        if method.startswith("notifications/"):
            return None
        try:
            result = self._dispatch(method, msg.get("params") or {})
        except _MethodNotFound:
            return self._err(msg_id, -32601, f"method not found: {method}")
        except (TypeError, KeyError, ValueError) as e:
            return self._err(msg_id, -32602, f"invalid params: {e}")
        return {"jsonrpc": "2.0", "id": msg_id, "result": result}

    @staticmethod
    def _err(msg_id, code: int, message: str) -> dict:
        return {"jsonrpc": "2.0", "id": msg_id,
                "error": {"code": code, "message": message}}

    def _dispatch(self, method: str, params: dict) -> dict:
        if method == "initialize":
            return {
                "protocolVersion": PROTOCOL_VERSION,
                "capabilities": {"tools": {}, "resources": {}},
                "serverInfo": {"name": "kgspark", "version": "0.4"},
            }
        if method == "ping":
            return {}
        if method == "tools/list":
            return {"tools": TOOLS}
        if method == "tools/call":
            return self._call_tool(params["name"],
                                   params.get("arguments") or {})
        if method == "resources/list":
            return {"resources": [{
                "uri": STATUS_URI, "name": "status",
                "mimeType": "application/json",
                "description": "engine and store status",
            }]}
        if method == "resources/read":
            if params.get("uri") != STATUS_URI:
                raise ValueError(f"unknown resource {params.get('uri')}")
            return {"contents": [{
                "uri": STATUS_URI, "mimeType": "application/json",
                "text": json.dumps(self._status()),
            }]}
        raise _MethodNotFound()

    # ---------------------------------------------------------------- tools
    def _call_tool(self, name: str, args: dict) -> dict:
        fn = getattr(self, f"_tool_{name}", None)
        if fn is None:
            raise ValueError(f"unknown tool {name}")
        try:
            payload = fn(**args)
            is_error = "error" in payload
        except Exception as e:  # engine errors → isError result, not RPC error
            payload, is_error = {"error": f"{type(e).__name__}: {e}"}, True
        return {
            "content": [{"type": "text",
                         "text": json.dumps(payload, default=_json_default)}],
            "isError": is_error,
        }

    def _status(self) -> dict:
        n_eps = (self.kg.store.read(self.kg.spark, "episodes").count()
                 if self.kg.store.exists("episodes") else 0)
        return {"status": "ok", "store_root": self.kg.store.root,
                "episodes": n_eps}

    def _tool_add_episode(self, name: str, episode_body: str,
                          group_id: str = "default", source: str = "text",
                          source_description: str = "",
                          timestamp: str | None = None,
                          uuid: str | None = None) -> dict:
        if uuid is not None:
            return {"error": "episode uuids are deterministic (sha1 of the "
                             "episode url) in this engine; a caller-supplied "
                             "uuid cannot be honored"}
        counts = self.kg.add_episode(
            name=name, episode_body=episode_body,
            source_description=source_description,
            reference_time=datetime.fromisoformat(timestamp) if timestamp
            else None,
            group_id=group_id,
        )
        return {"message": f"episode '{name}' added", "counts": counts}

    def _tool_search_nodes(self, query: str,
                           group_ids: list[str] | None = None,
                           max_nodes: int = 10,
                           center_node_uuid: str | None = None,
                           entity: str = "") -> dict:
        from kgspark.search.filters import SearchFilters
        from kgspark.search.recipes import (
            NODE_HYBRID_SEARCH_NODE_DISTANCE,
            NODE_HYBRID_SEARCH_RRF,
        )

        cfg = (NODE_HYBRID_SEARCH_NODE_DISTANCE if center_node_uuid
               else NODE_HYBRID_SEARCH_RRF)
        cfg = replace(cfg, limit=max_nodes)
        filters = SearchFilters(node_labels=[entity]) if entity else None
        ranked = self.kg.search_(query, cfg, group_ids,
                                 center_node_uuid, filters=filters).nodes
        if ranked is None or not self.kg.store.exists("nodes"):
            return {"message": "No relevant nodes found", "nodes": []}
        from pyspark.sql import functions as F

        nodes = self.kg.store.read(self.kg.spark, "nodes") \
            .drop("name_embedding")
        hydrated = (ranked.join(nodes, "uuid", "left")
                    .orderBy(F.desc("score"), "uuid"))
        out = _rows(hydrated, max_nodes)
        if not out:
            return {"message": "No relevant nodes found", "nodes": []}
        return {"message": "Nodes retrieved successfully", "nodes": out}

    def _tool_search_facts(self, query: str,
                           group_ids: list[str] | None = None,
                           max_facts: int = 10,
                           center_node_uuid: str | None = None) -> dict:
        df = self.kg.search(query=query, group_ids=group_ids,
                            center_node_uuid=center_node_uuid,
                            num_results=max_facts)
        facts = [_fact(r) for r in _rows(df, max_facts)]
        if not facts:
            return {"message": "No relevant facts found", "facts": []}
        return {"message": "Facts retrieved successfully", "facts": facts}

    def _tool_delete_entity_edge(self, uuid: str) -> dict:
        if not self.kg.remove_edge(uuid):
            return {"error": f"entity edge {uuid} not found"}
        return {"message": f"Entity edge {uuid} deleted"}

    def _tool_delete_episode(self, uuid: str) -> dict:
        from pyspark.sql import functions as F

        found = (self.kg.store.exists("episodes")
                 and bool(self.kg.store.read(self.kg.spark, "episodes")
                          .where(F.col("uuid") == uuid).take(1)))
        if not found:
            return {"error": f"episode {uuid} not found"}
        self.kg.remove_episode(uuid)
        return {"message": f"Episode {uuid} deleted"}

    def _tool_get_entity_edge(self, uuid: str) -> dict:
        rows = _rows(self.kg.get_edge(uuid), 1)
        if not rows:
            return {"error": f"entity edge {uuid} not found"}
        return _fact(rows[0])

    def _tool_get_episodes(self, group_id: str, last_n: int = 10) -> dict:
        df = self.kg.retrieve_episodes(reference_time=datetime.max,
                                       last_n=last_n, group_ids=[group_id])
        return {"episodes": _rows(df, last_n)}

    def _tool_clear_graph(self) -> dict:
        if self.kg.store.exists("episodes"):
            eps = self.kg.store.read(self.kg.spark, "episodes")
            groups = [r["group_id"] for r in
                      eps.select("group_id").distinct().collect()]
            if groups:
                self.kg.delete_group(groups)
        return {"message": "graph cleared"}


class _MethodNotFound(Exception):
    pass


def serve_stdio(kg: KGSpark, stdin: TextIO, stdout: TextIO) -> None:
    """Newline-delimited JSON-RPC loop (the MCP stdio transport)."""
    srv = MCPServer(kg)
    for line in stdin:
        line = line.strip()
        if not line:
            continue
        try:
            msg = json.loads(line)
        except json.JSONDecodeError as e:
            resp: dict | None = MCPServer._err(None, -32700,
                                               f"parse error: {e}")
        else:
            resp = srv.handle(msg)
        if resp is not None:
            stdout.write(json.dumps(resp, default=_json_default) + "\n")
            stdout.flush()


def main() -> None:
    import sys

    from kgspark.session import get_spark

    store_root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/kgspark-store"
    spark = get_spark("kgspark-mcp", master="local[8]", shuffle_partitions=8)
    serve_stdio(KGSpark(spark, store_root), sys.stdin, sys.stdout)


if __name__ == "__main__":
    main()
