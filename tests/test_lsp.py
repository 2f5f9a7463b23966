"""Cypher LSP server (reference: cypher_lsp.py; round-7).

Drives LspServer.handle_message directly with JSON-RPC dicts and a
captured transport — no subprocess needed. Framing round-trip is tested
through the real read/write functions over BytesIO.
"""

from __future__ import annotations

import io
import json

import pytest

from pycypher_nmetl_spark.lsp import LspServer, read_message, write_message


@pytest.fixture()
def server():
    sent: list[dict] = []
    srv = LspServer(send=sent.append)
    return srv, sent


def _open(srv, uri, text):
    srv.handle_message(
        {
            "jsonrpc": "2.0",
            "method": "textDocument/didOpen",
            "params": {"textDocument": {"uri": uri, "text": text}},
        }
    )


def test_initialize_capabilities(server):
    srv, sent = server
    srv.handle_message({"jsonrpc": "2.0", "id": 1, "method": "initialize", "params": {}})
    caps = sent[-1]["result"]["capabilities"]
    assert caps["hoverProvider"] and caps["documentFormattingProvider"]
    assert caps["completionProvider"]["triggerCharacters"]


def test_diagnostics_clean_query(server):
    srv, sent = server
    _open(srv, "file:///q.cypher", "MATCH (n:Person) RETURN n")
    note = sent[-1]
    assert note["method"] == "textDocument/publishDiagnostics"
    assert note["params"]["diagnostics"] == []


def test_diagnostics_syntax_error(server):
    srv, sent = server
    _open(srv, "file:///q.cypher", "MATCH (n:Person RETURN n")
    diags = sent[-1]["params"]["diagnostics"]
    assert len(diags) == 1 and diags[0]["severity"] == 1
    assert diags[0]["message"].startswith("Syntax error:")


def test_diagnostics_semantic_error_and_warning(server):
    srv, sent = server
    _open(srv, "file:///q.cypher", "MATCH (n:Person) RETURN m, n.dept, count(*)")
    diags = sent[-1]["params"]["diagnostics"]
    sev = sorted(d["severity"] for d in diags)
    assert 1 in sev  # undefined variable 'm'
    assert 2 in sev  # mixed-aggregation warning
    assert any("'m'" in d["message"] for d in diags)


def test_did_change_republishes(server):
    srv, sent = server
    _open(srv, "file:///q.cypher", "MATCH (n) RETURN q")
    assert sent[-1]["params"]["diagnostics"]
    srv.handle_message(
        {
            "jsonrpc": "2.0",
            "method": "textDocument/didChange",
            "params": {
                "textDocument": {"uri": "file:///q.cypher"},
                "contentChanges": [{"text": "MATCH (n) RETURN n"}],
            },
        }
    )
    assert sent[-1]["params"]["diagnostics"] == []


def test_completion_has_keywords_and_functions(server):
    srv, sent = server
    srv.handle_message(
        {
            "jsonrpc": "2.0", "id": 7, "method": "textDocument/completion",
            "params": {},
        }
    )
    labels = {i["label"] for i in sent[-1]["result"]["items"]}
    assert {"MATCH", "OPTIONAL MATCH", "MERGE"} <= labels
    assert {"toupper", "percentilecont", "coalesce"} <= labels


def test_hover_keyword_and_function(server):
    srv, sent = server
    _open(srv, "file:///q.cypher", "MATCH (n) RETURN toUpper(n.name)")
    srv.handle_message(
        {
            "jsonrpc": "2.0", "id": 9, "method": "textDocument/hover",
            "params": {
                "textDocument": {"uri": "file:///q.cypher"},
                "position": {"line": 0, "character": 1},
            },
        }
    )
    assert "MATCH" in sent[-1]["result"]["contents"]["value"]
    srv.handle_message(
        {
            "jsonrpc": "2.0", "id": 10, "method": "textDocument/hover",
            "params": {
                "textDocument": {"uri": "file:///q.cypher"},
                "position": {"line": 0, "character": 20},
            },
        }
    )
    assert "toupper" in sent[-1]["result"]["contents"]["value"]


def test_formatting_returns_canonical_text(server):
    srv, sent = server
    _open(srv, "file:///q.cypher", "match (n:Person)   return n.name as x")
    srv.handle_message(
        {
            "jsonrpc": "2.0", "id": 11, "method": "textDocument/formatting",
            "params": {"textDocument": {"uri": "file:///q.cypher"}},
        }
    )
    edits = sent[-1]["result"]
    assert len(edits) == 1
    assert "MATCH" in edits[0]["newText"] and "RETURN" in edits[0]["newText"]


def test_unknown_method_errors(server):
    srv, sent = server
    srv.handle_message({"jsonrpc": "2.0", "id": 12, "method": "nope/nope"})
    assert sent[-1]["error"]["code"] == -32601


def test_shutdown_exit(server):
    srv, sent = server
    srv.handle_message({"jsonrpc": "2.0", "id": 13, "method": "shutdown"})
    assert sent[-1]["result"] is None
    srv.handle_message({"jsonrpc": "2.0", "method": "exit"})
    assert srv.running is False


def test_framing_roundtrip():
    buf = io.BytesIO()
    write_message({"jsonrpc": "2.0", "id": 1, "method": "initialize"}, buf)
    buf.seek(0)
    msg = read_message(buf)
    assert msg == {"jsonrpc": "2.0", "id": 1, "method": "initialize"}
    assert read_message(buf) is None  # EOF


def test_hover_position_past_line_end_is_clamped(server):
    # LSP clients may send character > len(line); spec says clamp
    srv, sent = server
    _open(srv, "file:///q.cypher", "MATCH (n) RETURN n")
    srv.handle_message(
        {
            "jsonrpc": "2.0", "id": 20, "method": "textDocument/hover",
            "params": {
                "textDocument": {"uri": "file:///q.cypher"},
                "position": {"line": 0, "character": 9999},
            },
        }
    )
    # clamps to end-of-line -> word under cursor is the trailing "n"
    assert "error" not in sent[-1]


def test_formatting_range_covers_trailing_newline(server):
    srv, sent = server
    _open(srv, "file:///q.cypher", "match (n) return n\n")
    srv.handle_message(
        {
            "jsonrpc": "2.0", "id": 21, "method": "textDocument/formatting",
            "params": {"textDocument": {"uri": "file:///q.cypher"}},
        }
    )
    edit = sent[-1]["result"][0]
    # the edit must replace the WHOLE document including the trailing
    # newline, else each format pass appends stray text after newText
    assert edit["range"]["start"] == {"line": 0, "character": 0}
    assert edit["range"]["end"]["line"] >= 2
    assert edit["range"]["end"]["character"] == 0


def test_main_loop_survives_handler_exception(monkeypatch, capsys):
    # a request with a broken payload must produce a JSON-RPC error
    # response, not kill the server process
    import io as _io

    from pycypher_nmetl_spark import lsp as lsp_mod

    buf = _io.BytesIO()
    msgs = [
        {"jsonrpc": "2.0", "id": 1, "method": "textDocument/hover",
         "params": {"textDocument": {}}},  # missing uri/position -> KeyError
        None,  # EOF
    ]
    monkeypatch.setattr(lsp_mod, "read_message", lambda stream=None: msgs.pop(0))
    sent = []
    orig_write = lsp_mod.write_message
    monkeypatch.setattr(
        lsp_mod, "write_message",
        lambda msg, stream=None: sent.append(msg),
    )
    assert lsp_mod.main() == 0
    assert sent and sent[-1]["error"]["code"] == -32603
