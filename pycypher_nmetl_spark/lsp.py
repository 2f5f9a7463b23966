"""Cypher language server (reference: cypher_lsp.py — the editor surface
SURVEY §3.4 deferred; implemented here on the repo's own parser,
semantic validator, formatter and function registry, NOT as a port).

JSON-RPC 2.0 over stdio with Content-Length framing. Supported:

- ``initialize`` / ``initialized`` / ``shutdown`` / ``exit``
- ``textDocument/didOpen`` / ``didChange`` / ``didClose`` — each edit
  re-parses and re-validates, publishing diagnostics: syntax errors
  (severity 1) and semantic findings — undefined variables with
  did-you-mean hints as errors, mixed-aggregation / unknown-function
  findings as warnings (severity 2)
- ``textDocument/completion`` — Cypher keywords + every registered
  scalar/aggregate function
- ``textDocument/hover`` — keyword and function documentation
- ``textDocument/formatting`` — whole-document reformat via the
  canonical AST formatter

Run: ``python -m pycypher_nmetl_spark.lsp`` (an LSP client speaks
stdio), or drive :func:`handle_message` directly (how the tests do it).
"""

from __future__ import annotations

import json
import sys
from typing import Any, Callable

# ---------------------------------------------------------------------- #
# transport
# ---------------------------------------------------------------------- #
def read_message(stream=None) -> dict[str, Any] | None:
    """Read one Content-Length framed JSON-RPC message; None on EOF."""
    stream = stream or sys.stdin.buffer
    length = None
    while True:
        line = stream.readline()
        if not line:
            return None
        line = line.strip()
        if not line:
            break
        if line.lower().startswith(b"content-length:"):
            length = int(line.split(b":", 1)[1])
    if length is None:
        return None
    return json.loads(stream.read(length).decode("utf-8"))


def write_message(msg: dict[str, Any], stream=None) -> None:
    stream = stream or sys.stdout.buffer
    body = json.dumps(msg).encode("utf-8")
    stream.write(f"Content-Length: {len(body)}\r\n\r\n".encode("ascii") + body)
    stream.flush()


# ---------------------------------------------------------------------- #
# server state + handlers
# ---------------------------------------------------------------------- #
KEYWORDS = [
    "MATCH", "OPTIONAL MATCH", "WHERE", "RETURN", "WITH", "UNWIND",
    "CREATE", "MERGE", "SET", "REMOVE", "DELETE", "DETACH DELETE",
    "FOREACH", "CALL", "YIELD", "UNION", "UNION ALL", "ORDER BY",
    "SKIP", "LIMIT", "DISTINCT", "AS", "AND", "OR", "XOR", "NOT", "IN",
    "STARTS WITH", "ENDS WITH", "CONTAINS", "IS NULL", "IS NOT NULL",
    "CASE", "WHEN", "THEN", "ELSE", "END", "EXISTS", "ON CREATE",
    "ON MATCH", "ASC", "DESC",
]

KEYWORD_DOCS = {
    "MATCH": "Find graph patterns. `MATCH (n:Label)-[r:TYPE]->(m)`",
    "OPTIONAL MATCH": "Like MATCH, but unmatched rows survive with nulls.",
    "WHERE": "Filter rows by a predicate.",
    "RETURN": "Project the result columns (implicit grouping with aggregates).",
    "WITH": "Rescope variables mid-query; supports aggregation + trailing WHERE.",
    "UNWIND": "Expand a list into one row per element.",
    "CREATE": "Create nodes/relationships.",
    "MERGE": "Match-or-create a pattern; ON CREATE / ON MATCH set clauses.",
    "SET": "Write properties or labels.",
    "DELETE": "Delete entities (DETACH DELETE removes relationships too).",
    "FOREACH": "Run update clauses for each element of a list.",
    "CALL": "Invoke a procedure; bind its columns with YIELD.",
    "UNION": "Combine query results (UNION ALL keeps duplicates).",
    "CASE": "Conditional expression (simple or searched form).",
    "EXISTS": "Pattern/subquery existence predicate.",
}


class LspServer:
    """One server instance: document store + request dispatch."""

    def __init__(self, send: Callable[[dict], None] | None = None):
        self.documents: dict[str, str] = {}
        self.send = send or write_message
        self.running = True
        self._functions = self._function_names()

    @staticmethod
    def _function_names() -> list[str]:
        from pycypher_nmetl_spark.functions.scalar import (
            AGGREGATE_FUNCTIONS, SCALAR_FUNCTIONS,
        )

        return sorted(set(SCALAR_FUNCTIONS) | set(AGGREGATE_FUNCTIONS))

    # ---- diagnostics ------------------------------------------------- #
    def _diagnostics(self, text: str) -> list[dict[str, Any]]:
        from pycypher_nmetl_spark.semantic import ErrorSeverity, validate_query

        text = text.strip()
        if not text:
            return []
        out = []
        for f in validate_query(text):
            severity = 1 if f.severity is ErrorSeverity.ERROR else 2
            out.append(
                {
                    "range": {
                        "start": {"line": 0, "character": 0},
                        "end": {"line": 0, "character": max(1, len(text.splitlines()[0]))},
                    },
                    "severity": severity,
                    "source": "pycypher-nmetl-spark",
                    "message": f.message,
                }
            )
        return out

    def _publish(self, uri: str) -> None:
        self.send(
            {
                "jsonrpc": "2.0",
                "method": "textDocument/publishDiagnostics",
                "params": {
                    "uri": uri,
                    "diagnostics": self._diagnostics(self.documents.get(uri, "")),
                },
            }
        )

    # ---- completion / hover / formatting ----------------------------- #
    def _completions(self) -> list[dict[str, Any]]:
        items = [
            {"label": k, "kind": 14, "detail": "keyword"} for k in KEYWORDS
        ]
        items += [
            {"label": f, "kind": 3, "detail": "function"}
            for f in self._functions
        ]
        return items

    def _hover(self, uri: str, line: int, character: int) -> dict | None:
        text = self.documents.get(uri, "")
        lines = text.splitlines()
        if line >= len(lines):
            return None
        row = lines[line]
        # clamp: the LSP spec lets clients send positions past line end
        character = max(0, min(character, len(row)))
        start = character
        while start > 0 and (row[start - 1].isalnum() or row[start - 1] in "._"):
            start -= 1
        end = character
        while end < len(row) and (row[end].isalnum() or row[end] in "._"):
            end += 1
        word = row[start:end]
        if not word:
            return None
        if word.upper() in KEYWORD_DOCS:
            doc = KEYWORD_DOCS[word.upper()]
            return {"contents": {"kind": "markdown", "value": f"**{word.upper()}** — {doc}"}}
        if word.lower() in self._functions:
            return {
                "contents": {
                    "kind": "markdown",
                    "value": f"`{word.lower()}(...)` — registered Cypher function",
                }
            }
        return None

    def _format(self, uri: str) -> list[dict[str, Any]]:
        from pycypher_nmetl_spark.cypher.formatter import format_query
        from pycypher_nmetl_spark.cypher.parser import parse

        text = self.documents.get(uri, "")
        try:
            formatted = format_query(parse(text))
        except Exception:  # noqa: BLE001 — unformattable text: no edits
            return []
        # end the range one line past the last so a trailing newline (and
        # anything after it) is replaced too — splitlines() drops it, so
        # ending at len(lines[-1]) would leave stray text appended
        return [
            {
                "range": {
                    "start": {"line": 0, "character": 0},
                    "end": {"line": len(text.splitlines()) + 1, "character": 0},
                },
                "newText": formatted,
            }
        ]

    # ---- dispatch ---------------------------------------------------- #
    def handle_message(self, msg: dict[str, Any]) -> None:
        method = msg.get("method")
        mid = msg.get("id")
        params = msg.get("params") or {}

        def respond(result: Any) -> None:
            self.send({"jsonrpc": "2.0", "id": mid, "result": result})

        if method == "initialize":
            respond(
                {
                    "capabilities": {
                        "textDocumentSync": {"openClose": True, "change": 1},
                        "completionProvider": {"triggerCharacters": ["(", "."]},
                        "hoverProvider": True,
                        "documentFormattingProvider": True,
                    },
                    "serverInfo": {"name": "pycypher-nmetl-spark-lsp"},
                }
            )
        elif method == "initialized":
            pass
        elif method == "shutdown":
            respond(None)
        elif method == "exit":
            self.running = False
        elif method == "textDocument/didOpen":
            doc = params["textDocument"]
            self.documents[doc["uri"]] = doc.get("text", "")
            self._publish(doc["uri"])
        elif method == "textDocument/didChange":
            uri = params["textDocument"]["uri"]
            changes = params.get("contentChanges") or []
            if changes:
                self.documents[uri] = changes[-1].get("text", "")
            self._publish(uri)
        elif method == "textDocument/didClose":
            self.documents.pop(params["textDocument"]["uri"], None)
        elif method == "textDocument/completion":
            respond({"isIncomplete": False, "items": self._completions()})
        elif method == "textDocument/hover":
            pos = params["position"]
            respond(
                self._hover(
                    params["textDocument"]["uri"], pos["line"], pos["character"]
                )
            )
        elif method == "textDocument/formatting":
            respond(self._format(params["textDocument"]["uri"]))
        elif mid is not None:
            self.send(
                {
                    "jsonrpc": "2.0",
                    "id": mid,
                    "error": {"code": -32601, "message": f"unknown method {method}"},
                }
            )


def main() -> int:
    server = LspServer()
    while server.running:
        msg = read_message()
        if msg is None:
            break
        try:
            server.handle_message(msg)
        except Exception as e:  # noqa: BLE001 — one bad request must not
            # kill the server (the editor would lose diagnostics for good)
            if msg.get("id") is not None:
                write_message(
                    {
                        "jsonrpc": "2.0",
                        "id": msg["id"],
                        "error": {"code": -32603, "message": f"{type(e).__name__}: {e}"},
                    }
                )
    return 0


if __name__ == "__main__":
    sys.exit(main())
