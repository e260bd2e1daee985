"""Live browser viewer for the interactive session.

The reference opens a GLFW window (``src/VulkanContext.zig:95-213``);
a TPU host is display-less, so the live-viewing analog is a tiny
stdlib HTTP server: the browser shows PNG frames and forwards
scroll-to-zoom, drag-to-pan, resize, and the m/d/t toggle keys back to
the same ``InteractiveSession`` that powers the stdin protocol.

Endpoints (all GET):

- ``/``            the viewer page (canvas + event JS)
- ``/frame``       current frame as PNG (renders on demand)
- ``/ev``          apply events: ``scroll=<amt>&cx=&cy=`` /
                   ``dx=&dy=`` (drag, NDC) / ``key=m|d|t`` /
                   ``w=&h=`` (resize) / ``type=<text>``
- ``/stats``       session stats JSON

Single-threaded by design: one session, events and frames serialize,
exactly like the reference's single window loop.
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse

from fontrx.utils.log import get_logger

log = get_logger("Serve")

_PAGE = """<!doctype html>
<title>fontrx</title>
<style>body{margin:0;background:#222;overflow:hidden}img{display:block}</style>
<img id=v draggable=false>
<script>
const v = document.getElementById('v');
let n = 0, drag = null;
function refresh() { v.src = '/frame?n=' + (n++); }
function ev(q) { fetch('/ev?' + q).then(refresh); }
v.onload = () => {};
window.onwheel = e => {
  const cx = e.clientX / innerWidth * 2 - 1;
  const cy = 1 - e.clientY / innerHeight * 2;
  ev(`scroll=${-e.deltaY / 100}&cx=${cx}&cy=${cy}`);
};
window.onmousedown = e => drag = [e.clientX, e.clientY];
window.onmouseup = () => drag = null;
window.onmousemove = e => {
  if (!drag) return;
  const dx = (e.clientX - drag[0]) / innerWidth * 2;
  const dy = -(e.clientY - drag[1]) / innerHeight * 2;
  drag = [e.clientX, e.clientY];
  ev(`dx=${dx}&dy=${dy}`);
};
window.onkeydown = e => {
  if ('mdt'.includes(e.key)) ev('key=' + e.key);
};
function fit() { ev(`w=${innerWidth}&h=${innerHeight}`); }
window.onresize = fit;
fit();
</script>
"""


def make_handler(sess):
    from fontrx.io.png import encode as png_encode

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route to our logger
            log.debug(fmt, *args)

        def _send(self, code, ctype, body: bytes):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Cache-Control", "no-store")
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(url.query).items()}
            if url.path == "/":
                self._send(200, "text/html", _PAGE.encode())
            elif url.path == "/frame":
                rgba = sess.display_frame()
                self._send(200, "image/png", png_encode(rgba))
            elif url.path == "/ev":
                self._apply(q)
                self._send(204, "text/plain", b"")
            elif url.path == "/stats":
                self._send(
                    200, "application/json", json.dumps(sess.stats()).encode()
                )
            else:
                self._send(404, "text/plain", b"not found")

        def _apply(self, q):
            if "scroll" in q:
                sess.scroll(
                    float(q["scroll"]),
                    (float(q.get("cx", 0)), float(q.get("cy", 0))),
                )
            if "dx" in q or "dy" in q:
                sess.drag(float(q.get("dx", 0)), float(q.get("dy", 0)))
            if "key" in q:
                sess.key(q["key"])
            if "w" in q and "h" in q:
                sess.resize(int(q["w"]), int(q["h"]))
            if "type" in q:
                sess.char_input(q["type"])

    return Handler


def serve(sess, port: int, bind: str = "127.0.0.1") -> None:
    """Serve ``sess`` forever on ``bind:port`` (Ctrl-C to stop)."""
    httpd = HTTPServer((bind, port), make_handler(sess))
    log.info("live viewer at http://%s:%d/", bind, httpd.server_port)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
