"""Interactive viewer: a stdlib-only HTTP server streaming rendered frames.

The TPU-native replacement for the reference's interactive app layer
(main.gd + the vendored imgui-godot overlay): the browser is the display and
input device; this process owns the rasterizer. Feature parity with the
ImGui panel (main.gd:34-75):

  * live FPS / frame-ms, loaded file, splat & pair counts w/ overflow flag,
    memory use, render size, per-stage timings   → /stats JSON, shown in the
    HTML side panel
  * sliders: render scale, model scale, FOV; heatmap & pause checkboxes
  * camera: free-look (RMB drag + WASDQE), orbit (LMB drag), wheel zoom —
    the FreeLookCamera behaviors (util/camera.gd) reimplemented client-side
    against the same pose math, with pitch clamped to [-80°, 70°]
  * click picking → camera focus (main.gd:86-91)
  * drag-and-drop .ply loading (main.gd:29-30) via POST /load
  * pause-on-idle power saver (main.gd:146-152): the server only renders
    when the camera/state changed or a load is in progress

Run: python -m godotgaussiansplatting_tpu.viewer [model.ply] [--port 8000]
"""

from __future__ import annotations

import io
import json
import math
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ..engine.rasterizer import Rasterizer
from ..models.camera import Camera
from ..utils.image import encode_jpeg_fallback_png

_PAGE = """<!DOCTYPE html>
<html><head><title>gsplat-tpu viewer</title><style>
body{margin:0;background:#111;color:#ddd;font:13px monospace;display:flex}
#view{flex:1;display:flex;align-items:center;justify-content:center;height:100vh}
#img{max-width:100%;max-height:100vh;cursor:crosshair}
#panel{width:330px;padding:12px;background:#1a1a1f;overflow-y:auto}
#panel h3{margin:8px 0 4px;color:#8cf}
#panel label{display:block;margin:5px 0}
input[type=range]{width:150px;vertical-align:middle}
pre{color:#aaa;white-space:pre-wrap}
#loadbar{position:fixed;top:0;left:0;height:4px;background:#6cf;width:0%;
 transition:width .3s;z-index:9}
#cursor{position:absolute;width:14px;height:14px;border:2px solid #fff;
 border-radius:50%;box-shadow:0 0 6px #000;pointer-events:none;display:none;
 transform:translate(-50%,-50%)}
</style></head><body>
<div id=loadbar></div>
<div id=view style=position:relative><img id=img draggable=false>
<div id=cursor></div></div>
<div id=panel>
 <h3>GaussianSplatting (TPU)</h3>
 <div>Drag & drop .ply files on the window to load!</div>
 <pre id=stats></pre>
 <h3>Controls</h3>
 <label>Heatmap <input type=checkbox id=heatmap></label>
 <label>Allow pause <input type=checkbox id=pause checked></label>
 <label>Render scale <input type=range id=rscale min=0.05 max=1.5 step=0.05 value=1>
   <span id=rscale_v>1.00</span></label>
 <label>Model scale <input type=range id=mscale min=0.25 max=5 step=0.05 value=1>
   <span id=mscale_v>1.00</span></label>
 <label>FOV <input type=range id=fov min=20 max=170 step=1 value=75>
   <span id=fov_v>75</span></label>
 <div>RMB drag: free-look · WASDQE: fly · LMB drag: orbit · wheel: zoom ·
 click: focus</div>
</div>
<script>
const img = document.getElementById('img');
let state = {yaw:180, pitch:0, pos:[0,0,0], dist:2, orbit:[0,0,-2],
             fov:75, rscale:1, mscale:1, heatmap:0, pause:1};
let dirty = true, mode = null, last = null, keys = {};
function post(u,b){return fetch(u,{method:'POST',body:JSON.stringify(b)})}
img.addEventListener('mousedown', e => {mode = e.button===2?'look':'orbit'; last=[e.clientX,e.clientY]; e.preventDefault();});
window.addEventListener('mouseup', e => {
  if (mode==='orbit' && last && Math.abs(e.clientX-last[0])<3) {
    const r = img.getBoundingClientRect();
    post('/pick', {x:(e.clientX-r.left)/r.width, y:(e.clientY-r.top)/r.height});
  }
  mode=null;});
window.addEventListener('mousemove', e => {
  if(!mode) return;
  const dx = e.movementX*0.4, dy = e.movementY*0.4;
  state.yaw -= dx; state.pitch = Math.max(-80, Math.min(70, state.pitch - dy));
  dirty = true;});
img.addEventListener('contextmenu', e=>e.preventDefault());
img.addEventListener('wheel', e => {state.dist = Math.max(0.75, state.dist + (e.deltaY>0?0.25:-0.25)); dirty=true; e.preventDefault();});
window.addEventListener('keydown', e=>{keys[e.key.toLowerCase()]=1;});
window.addEventListener('keyup', e=>{keys[e.key.toLowerCase()]=0;});
setInterval(()=>{
  const sp = (keys['shift']?2.5:1)*0.08;
  let m=[0,0,0];
  if(keys['w'])m[2]-=sp; if(keys['s'])m[2]+=sp;
  if(keys['a'])m[0]-=sp; if(keys['d'])m[0]+=sp;
  if(keys['q'])m[1]-=sp; if(keys['e'])m[1]+=sp;
  if(m[0]||m[1]||m[2]){post('/move',{m:m}); dirty=true;}
}, 33);
for (const id of ['heatmap','pause']) document.getElementById(id).onchange = e => {state[id]=e.target.checked?1:0; dirty=true;};
for (const id of ['rscale','mscale','fov']) document.getElementById(id).oninput = e => {state[id]=parseFloat(e.target.value); document.getElementById(id+'_v').textContent=e.target.value; dirty=true;};
window.addEventListener('dragover', e=>e.preventDefault());
window.addEventListener('drop', async e => {
  e.preventDefault();
  const f = e.dataTransfer.files[0];
  if (f && f.name.endsWith('.ply')) {
    await fetch('/load', {method:'POST', body: await f.arrayBuffer()});
    dirty = true;
  }});
async function loop(){
  while(true){
    if(dirty){ dirty=false; await post('/state', state); }
    const r = await fetch('/frame');
    const b = await r.blob();
    img.src = URL.createObjectURL(b);
    const s = await (await fetch('/stats')).json();
    document.getElementById('stats').textContent = s.panel;
    document.getElementById('loadbar').style.width =
      (s.progress < 1 ? (s.progress*100)+'%' : '0%');
    const cur = document.getElementById('cursor');
    if (s.cursor) {
      const r = img.getBoundingClientRect();
      cur.style.display = 'block';
      cur.style.left = (s.cursor[0]*r.width) + 'px';
      cur.style.top = (s.cursor[1]*r.height) + 'px';
    } else cur.style.display = 'none';
  }
}
loop();
</script></body></html>"""


class ViewerState:
    def __init__(self, rasterizer: Rasterizer):
        self.r = rasterizer
        self.lock = threading.Lock()
        self.yaw, self.pitch = 180.0, 0.0
        self.dist = 2.0
        self.orbit = np.array([0.0, 0.0, -2.0], np.float32)  # godot frame
        self.cursor_frac = None   # picked point in [0,1]² image coords
        self.fov = 75.0
        self.pause_allowed = True
        self.last_change = time.monotonic()
        self.frame_png = encode_jpeg_fallback_png(
            np.zeros((8, 8, 3), np.float32))
        self.fps = 0.0

    def apply(self, st: dict):
        with self.lock:
            self.yaw = float(st.get("yaw", self.yaw))
            self.pitch = float(st.get("pitch", self.pitch))
            self.dist = float(st.get("dist", self.dist))
            self.fov = float(st.get("fov", self.fov))
            self.r.should_enable_heatmap = bool(st.get("heatmap", 0))
            self.pause_allowed = bool(st.get("pause", 1))
            rs = float(st.get("rscale", self.r.render_scale))
            if abs(rs - self.r.render_scale) > 1e-6:
                self.r.render_scale = rs
            self.r.model_scale = float(st.get("mscale", self.r.model_scale))
            self.last_change = time.monotonic()

    def camera(self) -> Camera:
        cam = Camera(fov_y=self.fov).with_yaw_pitch(self.yaw, self.pitch)
        fwd = -cam.basis[:, 2]
        cam.position = (self.orbit - fwd * self.dist).astype(np.float32)
        return cam

    def move(self, m):
        with self.lock:
            cam = self.camera()
            delta = (cam.basis @ np.asarray(m, np.float32)).astype(np.float32)
            self.orbit = self.orbit + delta
            self.last_change = time.monotonic()

    def render_loop(self):
        """Background render thread with the reference's pause-on-idle
        behavior (main.gd:146-152): idle → ~2 Hz keepalive renders."""
        while True:
            idle = (time.monotonic() - self.last_change) > 2.0
            if idle and self.pause_allowed and self.r.is_loaded:
                time.sleep(0.5)
                continue
            with self.lock:
                self.r.camera = self.camera()
            t0 = time.perf_counter()
            self.r.rasterize(sync=True)
            img = self.r.image()
            self.fps = 1.0 / max(time.perf_counter() - t0, 1e-6)
            self.frame_png = encode_jpeg_fallback_png(img)

    def panel_text(self) -> str:
        info = self.r.debug_info()
        lines = [
            f"FPS:             {self.fps:5.1f} ({1e3 / max(self.fps, 1e-6):.2f}ms)",
            f"Loaded:          {'(loading...)' if not info['is_loaded'] else 'yes'}"
            f" {info['num_splats_loaded']}/{info['num_splats']}",
            f"Rendered Splats: {info.get('rendered_splats', 0)}"
            + (" (buffer overflow!)" if info.get("buffer_overflow") else ""),
            f"Rendered Size:   {info['texture_size']}",
            f"VRAM Used:       {info.get('memory_used', 'n/a')}",
            "", "Stage Timings",
        ] + info["timing_lines"]
        return "\n".join(lines)


def serve(rasterizer: Rasterizer, port: int = 8000):
    state = ViewerState(rasterizer)
    threading.Thread(target=state.render_loop, daemon=True).start()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _send(self, code, body, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/":
                self._send(200, _PAGE.encode(), "text/html")
            elif self.path == "/frame":
                self._send(200, state.frame_png, "image/png")
            elif self.path == "/stats":
                prog = (state.r.num_splats_loaded
                        / max(1, state.r.cloud.num_splats))
                self._send(200, json.dumps({
                    "panel": state.panel_text(),
                    "progress": prog,
                    "cursor": state.cursor_frac,
                }).encode())
            else:
                self._send(404, b"{}")

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            if self.path == "/state":
                state.apply(json.loads(body))
            elif self.path == "/move":
                state.move(json.loads(body)["m"])
            elif self.path == "/pick":
                p = json.loads(body)
                w, h = state.r.texture_size
                pos = state.r.get_splat_position(
                    (p["x"] * w / max(state.r.render_scale, 1e-6),
                     p["y"] * h / max(state.r.render_scale, 1e-6)))
                if np.all(np.isfinite(pos)):
                    # set_focused_position (camera.gd:144-149), godot frame
                    state.orbit = np.array(
                        [-pos[0], -pos[1], pos[2]], np.float32)
                    state.cursor_frac = [p["x"], p["y"]]  # cursor.gd marker
                    state.last_change = time.monotonic()
            elif self.path == "/load":
                state.r.cleanup()
                state.r = Rasterizer(
                    bytes(body), texture_size=state.r.texture_size,
                    stream=True, quality=state.r.quality)
                state.last_change = time.monotonic()
            self._send(200, b"{}")

    httpd = ThreadingHTTPServer(("0.0.0.0", port), Handler)
    print(f"viewer at http://localhost:{port}/")
    httpd.serve_forever()
