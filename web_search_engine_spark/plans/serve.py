"""Thin JSON search service over a built index.

The reference serves queries via Flask (`HW2/app.py:56-116`: POST
/search -> search_topk_daat -> JSON). This is the stdlib analog (no
Flask in this environment): a threading HTTP server wrapping
SearchEngine — same request/response shape.

    POST /search  {"query": "...", "mode": "AND"|"OR", "topk": 10}
    ->            {"query": ..., "mode": ..., "results":
                   [{"rank": 1, "doc_id": 7, "score": 3.2, "snippet": ...}]}
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .search import SearchEngine, make_snippet


def make_server(
    index_dir: str, host: str = "127.0.0.1", port: int = 0,
    doc_texts: dict[int, str] | None = None,
) -> ThreadingHTTPServer:
    """Build (not start) the server; ``server.server_address`` has the
    bound port. ``doc_texts`` enables snippets (optional)."""
    engine = SearchEngine(index_dir)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if self.path != "/search":
                self._reply(404, {"error": "POST /search only"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                query = str(req.get("query", ""))
                mode = str(req.get("mode", "OR")).upper()
                topk = int(req.get("topk", 10))
                if mode not in ("AND", "OR"):
                    raise ValueError(f"bad mode {mode!r}")
            except (ValueError, json.JSONDecodeError) as e:
                self._reply(400, {"error": str(e)})
                return
            hits = engine.search(query, mode=mode, topk=topk)
            results = []
            for rank, (doc_id, score) in enumerate(hits, 1):
                row = {"rank": rank, "doc_id": doc_id, "score": round(score, 6)}
                if doc_texts and doc_id in doc_texts:
                    row["snippet"] = make_snippet(doc_texts[doc_id], query)
                results.append(row)
            self._reply(200, {"query": query, "mode": mode, "results": results})

    return ThreadingHTTPServer((host, port), Handler)


def serve_forever_in_thread(server: ThreadingHTTPServer) -> threading.Thread:
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return t
