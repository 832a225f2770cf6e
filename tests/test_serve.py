"""HTTP serving layer: POST /query, GET /healthz, /schema, /explain.

Extension — the reference has no serving surface (its CLI is the only
entry point, main.cu:120-128).
"""

import json
import threading
import urllib.request
import urllib.error

import numpy as np
import pytest

from warpdb_tpu import WarpDB
from warpdb_tpu.serve import QueryServer
from warpdb_tpu.storage import HostTable


@pytest.fixture(scope="module")
def server():
    db = WarpDB("data/test.csv")
    db.register_table(
        "rates",
        HostTable.from_dict(
            {
                "quantity": np.arange(8, dtype=np.float32),
                "rate": (np.arange(8) * 0.5).astype(np.float32),
            }
        ),
    )
    srv = QueryServer(db, port=0).start()
    yield srv
    srv.shutdown()


def _post(srv, path, payload):
    req = urllib.request.Request(
        f"http://{srv.host}:{srv.port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(srv, path):
    with urllib.request.urlopen(
        f"http://{srv.host}:{srv.port}{path}", timeout=30
    ) as r:
        return r.status, json.loads(r.read())


def test_healthz_and_schema(server):
    code, body = _get(server, "/healthz")
    assert code == 200 and body["ok"] and body["rows"] == 4
    code, body = _get(server, "/schema")
    assert code == 200
    assert body["columns"] == {"price": "FLOAT32", "quantity": "FLOAT32"}


def test_query(server):
    code, body = _post(
        server,
        "/query",
        {"sql": "SELECT quantity, SUM(price) AS total FROM test "
                "GROUP BY quantity ORDER BY total DESC"},
    )
    assert code == 200
    assert body["rows"] == 4
    assert body["columns"]["total"] == [30.0, 20.0, 15.25, 10.5]
    assert body["elapsed_ms"] > 0


def test_query_join_and_null_serialisation(server):
    code, body = _post(
        server,
        "/query",
        {"sql": "SELECT price, rate FROM test LEFT JOIN rates "
                "ON quantity = rates.quantity ORDER BY price"},
    )
    assert code == 200
    # quantity=5 has no build row (rates go 0..7? 5 exists) — use NULLIF
    code, body = _post(
        server, "/query", {"sql": "SELECT NULLIF(price, 10.5) FROM test"}
    )
    vals = list(body["columns"].values())[0]
    assert vals[0] is None  # NaN serialises as null (valid JSON)


def test_error_mapping(server):
    code, body = _post(server, "/query", {"sql": "SELECT nope FROM test"})
    assert code == 400 and body["error"] == "ValidationError"
    assert "Unknown column" in body["message"]
    code, body = _post(server, "/query", {"nope": 1})
    assert code == 400
    code, body = _get(server, "/healthz")  # server still alive
    assert code == 200


def test_explain(server):
    code, body = _post(
        server, "/explain",
        {"sql": "SELECT SUM(price) FROM test GROUP BY quantity"},
    )
    assert code == 200 and body["plan"].startswith("Plan for:")


def test_concurrent_queries(server):
    results = []

    def hit():
        code, body = _post(
            server, "/query",
            {"sql": "SELECT SUM(price) FROM test GROUP BY quantity"},
        )
        results.append((code, tuple(list(body["columns"].values())[0])))

    threads = [threading.Thread(target=hit) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(set(results)) == 1 and results[0][0] == 200
