"""HTTP server host tests (reference server routes, `server.rs:244-256`)."""

import json
import threading
import urllib.request

import pytest

from cozo_tpu import Db
from cozo_tpu.hosts.server import serve


@pytest.fixture()
def server_url():
    db = Db("mem")
    srv = serve(db, "127.0.0.1", 0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def post(url, path, body):
    req = urllib.request.Request(
        url + path,
        data=json.dumps(body).encode(),
        headers={"content-type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read())


def get(url, path):
    with urllib.request.urlopen(url + path) as resp:
        return json.loads(resp.read())


def test_text_query(server_url):
    out = post(server_url, "/text-query", {"script": "?[a] <- [[1], [2]]"})
    assert out["ok"] is True
    assert out["rows"] == [[1], [2]]


def test_text_query_error(server_url):
    out = post(server_url, "/text-query", {"script": "?[a] := nonexistent[a]"})
    assert out["ok"] is False
    assert "nonexistent" in out["message"]


def test_export_import(server_url):
    post(server_url, "/text-query", {"script": ":create exp {a}"})
    post(server_url, "/text-query", {"script": "?[a] <- [[5]] :put exp {a}"})
    out = get(server_url, "/export/exp")
    assert out["data"]["exp"]["rows"] == [[5]]
    req = urllib.request.Request(
        server_url + "/import",
        data=json.dumps({"exp": {"headers": ["a"], "rows": [[6]]}}).encode(),
        headers={"content-type": "application/json"},
        method="PUT",
    )
    with urllib.request.urlopen(req) as resp:
        assert json.loads(resp.read())["ok"]
    out = post(server_url, "/text-query", {"script": "?[a] := *exp[a]"})
    assert out["rows"] == [[5], [6]]


def test_transact(server_url):
    txid = post(server_url, "/transact", {})["id"]
    post(server_url, f"/transact/{txid}", {"script": ":create t {a}"})
    post(server_url, f"/transact/{txid}", {"script": "?[a] <- [[1]] :put t {a}"})
    post(server_url, f"/transact/{txid}", {"commit": True})
    out = post(server_url, "/text-query", {"script": "?[a] := *t[a]"})
    assert out["rows"] == [[1]]


def test_auth():
    db = Db("mem")
    srv = serve(db, "127.0.0.1", 0, auth_token="secret")
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{port}"
        req = urllib.request.Request(
            url + "/text-query",
            data=b'{"script": "?[a] <- [[1]]"}',
            headers={"content-type": "application/json"},
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(req)
        req.add_header("x-cozo-auth", "secret")
        with urllib.request.urlopen(req) as resp:
            assert json.loads(resp.read())["ok"]
    finally:
        srv.shutdown()
