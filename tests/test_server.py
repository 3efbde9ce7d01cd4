"""REST serving shim (kgspark/server.py) — reference parity for
server/graph_service/routers/{ingest,retrieve}.py driven over real HTTP
(http.client against an ephemeral-port server, engine backed by a real
SparkSession + on-disk store)."""

import http.client
import json
import threading

import pytest

from kgspark.api import KGSpark
from kgspark.server import serve


@pytest.fixture()
def api(spark, tmp_path):
    kg = KGSpark(spark, str(tmp_path / "store"))
    srv = serve(kg)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    conn = http.client.HTTPConnection("127.0.0.1", srv.server_port, timeout=120)

    def call(method, path, payload=None):
        body = json.dumps(payload) if payload is not None else None
        conn.request(method, path, body=body,
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        return resp.status, json.loads(resp.read())

    yield call
    conn.close()
    srv.shutdown()
    srv.server_close()


def test_rest_roundtrip(api):
    status, body = api("GET", "/healthcheck")
    assert (status, body) == (200, {"status": "healthy"})

    # ingest two messages (reference POST /messages, 202)
    status, body = api("POST", "/messages", {
        "group_id": "acme.example",
        "messages": [
            {"content": "Alice Porter works at Initech. Alice Porter "
                        "lives in Lisbon.",
             "timestamp": "2024-05-01T00:00:00"},
            {"content": "Alice Porter moved to Porto. Alice Porter "
                        "lives in Porto.",
             "timestamp": "2024-05-02T00:00:00"},
        ],
    })
    assert status == 202
    assert len(body["results"]) == 2
    assert all(r["new_episodes"] == 1 for r in body["results"])

    # search returns the LIVES_IN facts, the superseded one closed
    status, body = api("POST", "/search", {
        "query": "where does alice porter live",
        "group_ids": ["acme.example"], "max_results": 10})
    assert status == 200
    lives = {f["fact"]: f for f in body["facts"] if f["name"] == "LIVES_IN"}
    assert len(lives) == 2
    closed = [f for f in lives.values() if f["invalid_at"]]
    assert len(closed) == 1 and "Lisbon" in closed[0]["fact"]

    # episode retrieval, newest last (S9 semantics)
    status, body = api("GET", "/episodes/acme.example?last_n=5")
    assert status == 200 and len(body["episodes"]) == 2
    assert body["episodes"][0]["valid_at"] <= body["episodes"][1]["valid_at"]

    # get-memory composes the message query
    status, body = api("POST", "/get-memory", {
        "group_id": "acme.example",
        "messages": [{"role": "user", "content": "alice porter porto"}]})
    assert status == 200 and body["facts"]

    # delete one episode by uuid; its exclusive facts cascade away
    ep_uuid = body and api("GET", "/episodes/acme.example?last_n=5")[1][
        "episodes"][0]["uuid"]
    status, body = api("DELETE", f"/episode/{ep_uuid}")
    assert status == 200
    status, body = api("DELETE", "/episode/does-not-exist")
    assert status == 404

    # clear drops everything
    status, body = api("POST", "/clear")
    assert status == 200 and body["groups"] == ["acme.example"]
    status, body = api("GET", "/episodes/acme.example?last_n=5")
    assert status == 200 and body["episodes"] == []


def test_rest_bad_requests(api):
    status, body = api("GET", "/no-such-route")
    assert status == 404
    status, body = api("POST", "/search", {})  # missing "query"
    assert status == 400 and "error" in body
