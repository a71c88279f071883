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


def test_remote_custom_rule(server_url):
    """Remote fixed rules over HTTP (reference server.rs:521-568): register
    a rule, query blocks until a client posts the result."""
    import threading
    import time

    post(server_url, "/rules/RemoteDouble", {"arity": 1, "timeout": 30})

    result = {}

    def run_query():
        out = post(
            server_url,
            "/text-query",
            {"script": "?[x] <~ RemoteDouble()"},
        )
        result["out"] = out

    t = threading.Thread(target=run_query)
    t.start()
    # wait until the rule is pending, then deliver rows
    for _ in range(100):
        time.sleep(0.05)
        try:
            r = post(server_url, "/rules/RemoteDouble/result", {"rows": [[2], [4]]})
            if r.get("ok"):
                break
        except Exception:
            continue
    t.join(timeout=30)
    assert result["out"]["ok"] is True
    assert result["out"]["rows"] == [[2], [4]]


def test_sse_change_stream(server_url):
    """SSE change streams (reference server.rs:629)."""
    import threading
    import time
    import urllib.request

    post(server_url, "/text-query", {"script": ":create sse_rel {k}"})
    events = []

    def listen():
        req = urllib.request.Request(server_url + "/changes/sse_rel")
        with urllib.request.urlopen(req, timeout=20) as resp:
            for raw in resp:
                line = raw.decode("utf-8").strip()
                if line.startswith("data: "):
                    events.append(json.loads(line[len("data: "):]))
                    return

    t = threading.Thread(target=listen, daemon=True)
    t.start()
    time.sleep(0.5)  # let the callback register
    post(server_url, "/text-query", {"script": "?[k] <- [[42]] :put sse_rel {k}"})
    t.join(timeout=15)
    assert events and events[0]["op"] == "Put"
    assert events[0]["new"] == [[42]]
