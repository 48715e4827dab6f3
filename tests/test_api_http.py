"""MCP over a LIVE HTTP socket (SURVEY §2.6 transport parity).

Mirrors the reference e2e contract (apps/e2e/tests/search.spec.ts:1-35:
POST JSON-RPC to the mcp endpoint, expect 200 + result.content[0].text;
invalid alpha -> JSON-RPC error object, not an HTTP failure) and the
transport behavior of features/mcp/handler.go:568-597 (Content-Type
application/json on every reply, status 200 even for JSON-RPC errors,
empty 200 for notifications, Parse error for undecodable bodies) —
all four tools exercised end-to-end through the socket."""

import json
import urllib.request

import pytest
from pyspark.sql import functions as F

from qurio_spark.api import Engine
from qurio_spark.api_http import McpHttpServer
from qurio_spark.plans.pipeline import ingest
from qurio_spark.schemas import DOCUMENTS_RAW

from tests.test_pipeline import DOCS


@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    docs_raw = spark.createDataFrame(DOCS, DOCUMENTS_RAW)
    path = str(tmp_path_factory.mktemp("http_chunks") / "chunks")
    chunks = ingest(
        spark, docs_raw, path, source_names={"s1": "Docs", "s2": "Engine"}
    )
    pages = spark.createDataFrame(
        [("s1", "https://d.com/health", "done", 0),
         ("s1", "https://d.com/install", "done", 0)],
        "source_id string, url string, status string, depth int",
    )
    with McpHttpServer(Engine(chunks=chunks, pages=pages)) as srv:
        yield srv


def post(srv, payload, raw: bytes | None = None):
    req = urllib.request.Request(
        srv.url,
        data=raw if raw is not None else json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=30) as resp:
        body = resp.read()
        return resp.status, resp.headers.get("Content-Type"), (
            json.loads(body) if body else None
        )


def rpc(srv, rid, method, params=None):
    payload = {"jsonrpc": "2.0", "id": rid, "method": method}
    if params is not None:
        payload["params"] = params
    return post(srv, payload)


def tool(srv, rid, name, arguments=None):
    return rpc(srv, rid, "tools/call",
               {"name": name, "arguments": arguments or {}})


class TestMcpHttp:
    def test_initialize_and_tools_list(self, server):
        status, ctype, body = rpc(server, 1, "initialize")
        assert status == 200 and ctype == "application/json"
        assert body["result"]["serverInfo"]["name"] == "qurio-spark"
        _, _, tools = rpc(server, 2, "tools/list")
        assert {t["name"] for t in tools["result"]["tools"]} == {
            "qurio_search", "qurio_list_sources",
            "qurio_list_pages", "qurio_read_page",
        }

    def test_notification_empty_200(self, server):
        status, ctype, body = rpc(server, None, "notifications/initialized")
        assert status == 200 and body is None

    def test_search_with_alpha_and_limit(self, server):
        # search.spec.ts:4-34: overrides accepted, result.content[0]
        # is text, no error member
        status, _, body = tool(
            server, 3, "qurio_search",
            {"query": "configure healthcheck", "alpha": 0.1, "limit": 5},
        )
        assert status == 200 and "error" not in body
        content = body["result"]["content"][0]
        assert content["type"] == "text"
        assert "Result 1 (Score:" in content["text"]

    def test_invalid_alpha_is_jsonrpc_error_not_http_error(self, server):
        # search.spec.ts:36+: out-of-range alpha -> error object, HTTP 200
        status, _, body = tool(
            server, 4, "qurio_search", {"query": "x", "alpha": 1.5}
        )
        assert status == 200
        assert body["error"]["code"] == -32602

    def test_list_sources_and_pages(self, server):
        _, _, body = tool(server, 5, "qurio_list_sources")
        assert "No sources configured." in body["result"]["content"][0]["text"]
        _, _, pages = tool(server, 6, "qurio_list_pages", {"source_id": "s1"})
        text = pages["result"]["content"][0]["text"]
        assert "https://d.com/health" in text and "[done]" in text

    def test_read_page_roundtrip(self, server):
        _, _, body = tool(
            server, 7, "qurio_read_page", {"url": "https://d.com/health"}
        )
        text = body["result"]["content"][0]["text"]
        assert "healthcheck" in text.lower()

    def test_parse_error(self, server):
        status, ctype, body = post(server, None, raw=b"{not json")
        assert status == 200 and ctype == "application/json"
        assert body["error"]["code"] == -32700

    def test_unknown_tool_and_method(self, server):
        _, _, body = tool(server, 8, "nope_tool")
        assert body["error"]["code"] == -32601
        _, _, body2 = rpc(server, 9, "bogus/method")
        assert body2["error"]["code"] == -32601
