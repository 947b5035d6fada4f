"""Live frame-streaming viewer: the interactive-window analog.

The reference is an interactive winit window with a fly camera and an egui
GUI (`/root/reference/crates/standalone/src/app.rs:269-344`,
`gui/mod.rs:88-174`). A TPU host has no display, so the TPU-native
equivalent streams frames to a browser over HTTP and accepts camera /
settings input back:

  GET  /            viewer page (canvas + WASD/mouse handlers)
  GET  /frame?after=N   latest JPEG frame, long-polled past frame N
  GET  /stats       fps / frame timing / scene stats / settings JSON
  POST /input       {"type": "key"|"drag"|"command"|"setting", ...}

One render thread owns all JAX work (Driver.step + blit + encode); HTTP
threads only touch the latest-frame slot and the input queue. Run with:
``python -m loupiote_tpu serve scene.glb --port 8722``.
"""

from __future__ import annotations

import io
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from .input import InputManager

_PAGE = """<!doctype html>
<html><head><title>loupiote-tpu viewer</title><style>
body { margin:0; background:#111; color:#ddd; font:13px monospace; }
#hud { position:fixed; top:8px; left:8px; background:#000a; padding:6px 10px;
       border-radius:4px; white-space:pre; }
img  { display:block; margin:0 auto; image-rendering:pixelated; }
</style></head><body>
<img id="view" tabindex="0">
<div id="hud">connecting...</div>
<div id="bar" style="position:fixed;top:8px;right:8px;background:#000a;
     padding:6px 10px;border-radius:4px">
  <select id="mode">
    <option value="denoised">denoised</option>
    <option value="pathtrace">pathtrace</option>
    <option value="temporal">temporal</option>
    <option value="gbuffer">gbuffer</option>
    <option value="motion">motion</option>
  </select>
  <button id="shot">&#128247;</button>
</div>
<script>
const img = document.getElementById('view');
const hud = document.getElementById('hud');
let after = -1, dragging = false, lx = 0, ly = 0;
async function frames() {
  for (;;) {
    try {
      const r = await fetch('/frame?after=' + after);
      after = parseInt(r.headers.get('X-Frame-Id'));
      const blob = await r.blob();
      const url = URL.createObjectURL(blob);
      img.onload = () => URL.revokeObjectURL(url);
      img.src = url;
    } catch (e) { await new Promise(r => setTimeout(r, 250)); }
  }
}
async function stats() {
  for (;;) {
    try {
      const s = await (await fetch('/stats')).json();
      hud.textContent = `fps ${s.fps.toFixed(1)}  frame ${s.frame_ms.toFixed(0)}ms` +
        `  accum ${s.accumulate ? 'on' : 'off'} (space)` +
        `\\nWASD/arrows move - drag rotates - ${s.triangles} tris`;
    } catch (e) {}
    await new Promise(r => setTimeout(r, 500));
  }
}
function send(o) { fetch('/input', {method:'POST', body:JSON.stringify(o)}); }
document.getElementById('mode').addEventListener('change', e =>
  send({type:'setting', name:'blit_mode', value:e.target.value}));
document.getElementById('shot').addEventListener('click', () =>
  send({type:'screenshot'}));
const keys = {'w':1,'a':1,'s':1,'d':1,' ':1,'arrowup':'up','arrowdown':'down',
              'arrowleft':'left','arrowright':'right'};
window.addEventListener('keydown', e => { const k = e.key.toLowerCase();
  if (keys[k]) { send({type:'key', key: typeof keys[k]=='string'?keys[k]:k,
                       pressed:true}); e.preventDefault(); } });
window.addEventListener('keyup', e => { const k = e.key.toLowerCase();
  if (keys[k]) send({type:'key', key: typeof keys[k]=='string'?keys[k]:k,
                     pressed:false}); });
img.addEventListener('mousedown', e => { dragging=true; lx=e.clientX; ly=e.clientY; });
window.addEventListener('mouseup', () => dragging=false);
window.addEventListener('mousemove', e => {
  if (!dragging) return;
  send({type:'drag', dx: e.clientX-lx, dy: e.clientY-ly});
  lx = e.clientX; ly = e.clientY; });
frames(); stats();
</script></body></html>"""


class ViewerServer:
    """HTTP viewer around a Driver. All JAX work stays on the render thread."""

    def __init__(self, driver, host: str = "127.0.0.1", port: int = 8722,
                 jpeg_quality: int = 85, max_fps: float = 60.0,
                 screenshot_dir: Optional[str] = None):
        self.driver = driver
        # Warm startup: persist/reuse the compiled frame executable across
        # server processes (render/aot.py — 0.5 s deserialize vs 70-94 s
        # fresh-process compile through the tunnel).
        driver.renderer.enable_aot_cache()
        self.input = InputManager()
        self._events: "queue.Queue[dict]" = queue.Queue()
        self._frame_lock = threading.Condition()
        self._frame_id = -1
        self._frame_jpeg = b""
        self._stop = threading.Event()
        self._min_dt = 1.0 / max_fps
        self._jpeg_quality = jpeg_quality
        self._stats: dict = {}
        # Screenshot directory: server-controlled AND user-owned. A fixed
        # world-writable /tmp path could be pre-created (or symlinked) by
        # another local user to capture/redirect the PNG writes (round-3
        # advisor finding) — default to a fresh mkdtemp under the user's
        # control instead, created lazily on first use.
        self._screenshot_dir = screenshot_dir

        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                if self.path == "/" or self.path.startswith("/index"):
                    body = _PAGE.encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                elif self.path.startswith("/frame"):
                    after = -1
                    if "after=" in self.path:
                        try:
                            after = int(self.path.split("after=")[1]
                                        .split("&")[0])
                        except ValueError:
                            pass
                    fid, data = server.wait_frame(after, timeout=5.0)
                    if data is None:
                        self.send_response(204)
                        self.end_headers()
                        return
                    self.send_response(200)
                    self.send_header("Content-Type", "image/jpeg")
                    self.send_header("X-Frame-Id", str(fid))
                    self.send_header("Content-Length", str(len(data)))
                    self.end_headers()
                    self.wfile.write(data)
                elif self.path.startswith("/stats"):
                    body = json.dumps(server._stats).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    self.send_response(404)
                    self.end_headers()

            def do_POST(self):
                if self.path.startswith("/input"):
                    n = int(self.headers.get("Content-Length", 0))
                    try:
                        server._events.put(json.loads(self.rfile.read(n)))
                        self.send_response(200)
                    except (ValueError, TypeError):
                        self.send_response(400)
                    self.end_headers()
                else:
                    self.send_response(404)
                    self.end_headers()

        self._http = ThreadingHTTPServer((host, port), Handler)
        self.port = self._http.server_address[1]
        self._http_thread = threading.Thread(
            target=self._http.serve_forever, daemon=True)
        self._render_thread = threading.Thread(
            target=self._render_loop, daemon=True)

    # -- frame slot ----------------------------------------------------------
    def wait_frame(self, after: int, timeout: float = 5.0):
        deadline = time.time() + timeout
        with self._frame_lock:
            while self._frame_id <= after:
                left = deadline - time.time()
                if left <= 0:
                    return (self._frame_id, self._frame_jpeg or None)
                self._frame_lock.wait(left)
            return self._frame_id, self._frame_jpeg

    def _publish(self, jpeg: bytes):
        with self._frame_lock:
            self._frame_id += 1
            self._frame_jpeg = jpeg
            self._frame_lock.notify_all()

    # -- input ----------------------------------------------------------------
    def _drain_events(self):
        while True:
            try:
                ev = self._events.get_nowait()
            except queue.Empty:
                return
            kind = ev.get("type")
            if kind == "key":
                self.input.handle_key(self.driver, ev.get("key", ""),
                                      bool(ev.get("pressed")))
            elif kind == "drag":
                self.input.handle_mouse_drag(
                    self.driver, float(ev.get("dx", 0)),
                    float(ev.get("dy", 0)))
            elif kind == "command":
                self.driver.run_command(ev.get("command", ""))
            elif kind == "setting":
                name, value = ev.get("name"), ev.get("value")
                if name == "blit_mode":
                    from ..config import BlitMode

                    modes = {"pathtrace": BlitMode.PATHTRACE,
                             "denoised": BlitMode.DENOISED_PATHTRACE,
                             "temporal": BlitMode.TEMPORAL,
                             "gbuffer": BlitMode.GBUFFER,
                             "motion": BlitMode.MOTION_VECTOR}
                    if value in modes:
                        self.driver.settings.blit_mode = modes[value]
                # Only whitelisted settings with validated types: /input is
                # network-facing, so arbitrary setattr from client JSON is
                # off the table.
                elif name == "accumulate":
                    self.driver.settings.accumulate = bool(value)
                elif name == "use_blue_noise":
                    self.driver.settings.use_blue_noise = bool(value)
            elif kind == "screenshot":
                # The path is server-controlled: a client-supplied path
                # would let any network peer write arbitrary files.
                import os
                import time as _t

                if self._screenshot_dir is None:
                    import tempfile

                    self._screenshot_dir = tempfile.mkdtemp(
                        prefix="loupiote_shots_")
                else:
                    os.makedirs(self._screenshot_dir, exist_ok=True)
                    st = os.lstat(self._screenshot_dir)
                    import stat as _stat

                    if (_stat.S_ISLNK(st.st_mode)
                            or st.st_uid != os.getuid()):
                        raise PermissionError(
                            f"screenshot dir {self._screenshot_dir} is a "
                            "symlink or owned by another user")
                path = os.path.join(
                    self._screenshot_dir,
                    f"shot_{int(_t.time() * 1000)}.png")
                self.driver.save_screenshot(path)

    # -- render loop -----------------------------------------------------------
    def _render_loop(self):
        import traceback

        from PIL import Image

        d = self.driver
        errors = 0
        while not self._stop.is_set():
            t0 = time.time()
            try:
                self._drain_events()
                d.step()
                img = d.renderer.blit()  # (H, W, 3/4) uint8
            except Exception:
                self.render_error = traceback.format_exc()
                self._stats = dict(self._stats, render_error=self.render_error)
                errors += 1
                if errors > 10:
                    return
                time.sleep(0.5)
                continue
            buf = io.BytesIO()
            Image.fromarray(np.asarray(img)).convert("RGB").save(
                buf, "JPEG", quality=self._jpeg_quality)
            self._publish(buf.getvalue())
            stats = dict(getattr(d, "stats", {}))
            mode = d.settings.blit_mode
            stats.update(fps=d.fps, frame_ms=d.queries.frame_ms,
                         accumulate=d.settings.accumulate,
                         frame_id=self._frame_id,
                         blit_mode=getattr(mode, "value", str(mode)))
            stats.setdefault("triangles", 0)
            self._stats = stats
            dt = time.time() - t0
            if dt < self._min_dt:
                time.sleep(self._min_dt - dt)

    # -- lifecycle --------------------------------------------------------------
    def start(self):
        self._http_thread.start()
        self._render_thread.start()
        return self

    def stop(self):
        self._stop.set()
        self._http.shutdown()
        self._render_thread.join(timeout=10)

    def serve_forever(self):
        self.start()
        try:
            while True:
                time.sleep(1)
        except KeyboardInterrupt:
            self.stop()
