"""MCP serving shim (kgspark/mcp.py) — reference parity for
mcp_server/graphiti_mcp_server.py's tool surface, driven as JSON-RPC
messages against a real SparkSession + on-disk store (in-process via
MCPServer.handle; stdio framing covered separately with StringIO)."""

import io
import json

import pytest

from kgspark.api import KGSpark
from kgspark.mcp import TOOLS, MCPServer, serve_stdio


@pytest.fixture()
def srv(spark, tmp_path):
    return MCPServer(KGSpark(spark, str(tmp_path / "store")))


def rpc(srv, method, params=None, msg_id=1):
    return srv.handle({"jsonrpc": "2.0", "id": msg_id, "method": method,
                       "params": params or {}})


def call_tool(srv, name, args=None):
    resp = rpc(srv, "tools/call", {"name": name, "arguments": args or {}})
    assert "result" in resp, resp
    res = resp["result"]
    return json.loads(res["content"][0]["text"]), res["isError"]


def test_handshake_and_listing(srv):
    resp = rpc(srv, "initialize", {"protocolVersion": "2024-11-05"})
    res = resp["result"]
    assert res["protocolVersion"] and res["serverInfo"]["name"] == "kgspark"
    assert "tools" in res["capabilities"]

    # notifications take no response
    assert srv.handle({"jsonrpc": "2.0",
                       "method": "notifications/initialized"}) is None
    assert rpc(srv, "ping")["result"] == {}

    tools = rpc(srv, "tools/list")["result"]["tools"]
    assert {t["name"] for t in tools} == {
        "add_episode", "search_nodes", "search_facts", "delete_entity_edge",
        "delete_episode", "get_entity_edge", "get_episodes", "clear_graph",
    }  # the reference's @mcp.tool set, graphiti_mcp_server.py:653-1089
    for t in TOOLS:
        assert t["inputSchema"]["type"] == "object"

    bad = rpc(srv, "no/such/method")
    assert bad["error"]["code"] == -32601


def test_tool_roundtrip(srv):
    out, err = call_tool(srv, "add_episode", {
        "name": "ep1",
        "episode_body": "Alice Porter works at Initech. "
                        "Alice Porter lives in Lisbon.",
        "group_id": "acme.example",
        "timestamp": "2024-05-01T00:00:00",
    })
    assert not err and out["counts"]["new_episodes"] == 1
    out, err = call_tool(srv, "add_episode", {
        "name": "ep2",
        "episode_body": "Alice Porter moved to Porto. "
                        "Alice Porter lives in Porto.",
        "group_id": "acme.example",
        "timestamp": "2024-05-02T00:00:00",
    })
    assert not err

    # facts: hydrated edge records, embedding stripped
    out, err = call_tool(srv, "search_facts", {
        "query": "Where does Alice Porter live?",
        "group_ids": ["acme.example"], "max_facts": 5})
    assert not err and out["facts"]
    fact = out["facts"][0]
    assert {"uuid", "name", "fact", "valid_at", "invalid_at"} <= set(fact)
    assert "fact_embedding" not in fact

    # nodes: summaries hydrated from the nodes table
    out, err = call_tool(srv, "search_nodes", {
        "query": "Alice Porter", "group_ids": ["acme.example"]})
    assert not err and out["nodes"]
    names = {n["name"] for n in out["nodes"]}
    assert "Alice Porter" in names
    assert all("name_embedding" not in n for n in out["nodes"])

    out, err = call_tool(srv, "get_episodes",
                         {"group_id": "acme.example", "last_n": 10})
    assert not err and len(out["episodes"]) == 2

    # point lookup then targeted delete of one edge
    edge_uuid = fact["uuid"]
    out, err = call_tool(srv, "get_entity_edge", {"uuid": edge_uuid})
    assert not err and out["uuid"] == edge_uuid
    out, err = call_tool(srv, "delete_entity_edge", {"uuid": edge_uuid})
    assert not err
    out, err = call_tool(srv, "get_entity_edge", {"uuid": edge_uuid})
    assert err
    out, err = call_tool(srv, "delete_entity_edge", {"uuid": edge_uuid})
    assert err  # already gone
    # the deleted fact no longer surfaces in search
    out, _ = call_tool(srv, "search_facts", {
        "query": "Where does Alice Porter live?",
        "group_ids": ["acme.example"], "max_facts": 20})
    assert edge_uuid not in {f["uuid"] for f in out["facts"]}

    # cascading episode delete, then clear
    ep_uuid = out_eps = None
    out, _ = call_tool(srv, "get_episodes",
                       {"group_id": "acme.example", "last_n": 1})
    ep_uuid = out["episodes"][0]["uuid"]
    out, err = call_tool(srv, "delete_episode", {"uuid": ep_uuid})
    assert not err
    out, err = call_tool(srv, "get_episodes",
                         {"group_id": "acme.example", "last_n": 10})
    assert len(out["episodes"]) == 1

    out, err = call_tool(srv, "clear_graph")
    assert not err
    out, err = call_tool(srv, "get_episodes",
                         {"group_id": "acme.example", "last_n": 10})
    assert out["episodes"] == []

    status = json.loads(rpc(srv, "resources/read", {
        "uri": "kgspark://status"})["result"]["contents"][0]["text"])
    assert status["status"] == "ok" and status["episodes"] == 0


def test_tool_errors(srv):
    # caller-supplied uuid is rejected, not silently ignored
    out, err = call_tool(srv, "add_episode", {
        "name": "e", "episode_body": "x", "uuid": "custom"})
    assert err and "deterministic" in out["error"]

    resp = rpc(srv, "tools/call", {"name": "nope", "arguments": {}})
    assert resp["error"]["code"] == -32602

    out, err = call_tool(srv, "delete_episode", {"uuid": "missing"})
    assert err and "not found" in out["error"]


def test_stdio_framing(srv):
    lines = "\n".join([
        json.dumps({"jsonrpc": "2.0", "id": 1, "method": "initialize",
                    "params": {}}),
        json.dumps({"jsonrpc": "2.0", "method":
                    "notifications/initialized"}),
        "this is not json",
        json.dumps({"jsonrpc": "2.0", "id": 2, "method": "ping"}),
    ]) + "\n"
    out = io.StringIO()
    serve_stdio(srv.kg, io.StringIO(lines), out)
    resps = [json.loads(ln) for ln in out.getvalue().splitlines()]
    assert len(resps) == 3  # notification produced no line
    assert resps[0]["id"] == 1 and "result" in resps[0]
    assert resps[1]["error"]["code"] == -32700
    assert resps[2] == {"jsonrpc": "2.0", "id": 2, "result": {}}
