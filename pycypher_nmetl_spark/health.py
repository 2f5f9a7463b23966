"""Health & metrics HTTP endpoint (reference: health_server.py,
shared/metrics.py).

A tiny stdlib HTTP server exposing:
  GET /health  -> {"status": "ok", "spark": "<version>"}
  GET /metrics -> catalog + cache counters, Prometheus-ish text

Runs on a daemon thread; intended for pipeline/service deployments.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer


class HealthServer:
    def __init__(self, engine, host: str = "127.0.0.1", port: int = 0):
        self.engine = engine
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # silence
                pass

            def do_GET(self):  # noqa: N802
                if self.path == "/health":
                    body = json.dumps(
                        {
                            "status": "ok",
                            "spark": outer.engine.spark.version,
                            "labels": len(outer.engine.catalog.labels()),
                            "rel_types": len(outer.engine.catalog.rel_types()),
                        }
                    ).encode()
                    ctype = "application/json"
                elif self.path == "/metrics":
                    cache = outer.engine.cache
                    lines = [
                        f"catalog_labels {len(outer.engine.catalog.labels())}",
                        f"catalog_rel_types {len(outer.engine.catalog.rel_types())}",
                        f"catalog_data_epoch {outer.engine.catalog.data_epoch}",
                    ]
                    if cache is not None:
                        lines += [
                            f"result_cache_hits {cache.hits}",
                            f"result_cache_misses {cache.misses}",
                        ]
                    metrics = getattr(outer.engine, "metrics", None)
                    if metrics is not None:
                        lines += metrics.as_lines()
                    body = ("\n".join(lines) + "\n").encode()
                    ctype = "text/plain"
                else:
                    self.send_response(404)
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._server = HTTPServer((host, port), Handler)
        self.port = self._server.server_address[1]
        self._thread: threading.Thread | None = None

    def start(self) -> "HealthServer":
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
