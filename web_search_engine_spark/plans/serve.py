"""Thin JSON search service over a built index, with a browser page.

The reference serves queries via Flask (`HW2/app.py:56-116`: POST
/search -> search_topk_daat -> JSON) and ships a static search page
(`HW2/frontend/index.html`: query box + AND/OR conjunctive mode radios
POSTing to /search). This is the stdlib analog (no Flask in this
environment): a threading HTTP server wrapping SearchEngine — same
request/response shape — plus GET / serving a self-contained HTML page
(written fresh for this engine, not copied).

    GET  /        -> HTML search page
    POST /search  {"query": "...", "mode": "AND"|"OR", "topk": 10}
    ->            {"query": ..., "mode": ..., "total": N, "search_ms": T,
                   "results": [{"rank": 1, "doc_id": 7, "score": 3.2,
                                "snippet": ...}]}
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .search import SearchEngine, make_snippet

_PAGE = """<!doctype html>
<html lang="en"><head><meta charset="utf-8">
<meta name="viewport" content="width=device-width,initial-scale=1">
<title>web_search_engine_spark</title>
<style>
 body{font-family:system-ui,sans-serif;max-width:44rem;margin:3rem auto;
      padding:0 1rem;color:#222}
 h1{font-weight:300;letter-spacing:-1px}
 form{display:flex;gap:.5rem;flex-wrap:wrap;margin:1rem 0}
 input[type=text]{flex:1;min-width:16rem;padding:.5rem .8rem;font-size:1rem;
      border:1px solid #bbb;border-radius:6px}
 button{padding:.5rem 1.2rem;border:0;border-radius:6px;background:#2563eb;
      color:#fff;font-size:1rem;cursor:pointer}
 .meta{color:#666;font-size:.85rem;margin:.6rem 0}
 .hit{margin:.9rem 0}.hit b{font-size:1.05rem}
 .hit .snip{color:#444}.hit .sc{color:#888;font-size:.8rem}
</style></head><body>
<h1>web_search_engine_spark</h1>
<form id="f">
 <input type="text" id="q" placeholder="search terms" autofocus>
 <label><input type="radio" name="mode" value="OR" checked> OR</label>
 <label><input type="radio" name="mode" value="AND"> AND</label>
 <button>Search</button>
</form>
<div id="out"></div>
<script>
document.getElementById('f').addEventListener('submit', async (ev) => {
  ev.preventDefault();
  const q = document.getElementById('q').value;
  const mode = document.querySelector('input[name=mode]:checked').value;
  const out = document.getElementById('out');
  out.textContent = 'searching\\u2026';
  try {
    const r = await fetch('/search', {
      method: 'POST', headers: {'Content-Type': 'application/json'},
      body: JSON.stringify({query: q, mode: mode, topk: 10})});
    const d = await r.json();
    if (!r.ok) { out.textContent = 'error: ' + (d.error || r.status); return; }
    let h = `<div class="meta">${d.total} result(s) in ${d.search_ms} ms</div>`;
    for (const hit of d.results) {
      h += `<div class="hit"><b>#${hit.rank} doc ${hit.doc_id}</b>
            <span class="sc">score ${hit.score}</span>`;
      if (hit.snippet) h += `<div class="snip"></div>`;
      h += `</div>`;
    }
    out.innerHTML = h;
    const snips = out.querySelectorAll('.snip');
    d.results.filter(x => x.snippet).forEach(
      (x, i) => { if (snips[i]) snips[i].textContent = x.snippet; });
  } catch (e) { out.textContent = 'error: ' + e; }
});
</script></body></html>
"""


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

        def do_GET(self):
            if self.path not in ("/", "/index.html"):
                self._reply(404, {"error": "GET / or POST /search"})
                return
            body = _PAGE.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
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
            t0 = time.perf_counter()
            hits = engine.search(query, mode=mode, topk=topk)
            search_ms = round((time.perf_counter() - t0) * 1000, 2)
            results = []
            for rank, (doc_id, score) in enumerate(hits, 1):
                row = {"rank": rank, "doc_id": doc_id, "score": round(score, 6)}
                if doc_texts and doc_id in doc_texts:
                    row["snippet"] = make_snippet(doc_texts[doc_id], query)
                results.append(row)
            self._reply(200, {
                "query": query, "mode": mode, "total": len(results),
                "search_ms": search_ms, "results": results,
            })

    return ThreadingHTTPServer((host, port), Handler)


def serve_forever_in_thread(server: ThreadingHTTPServer) -> threading.Thread:
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return t
