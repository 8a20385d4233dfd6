"""Interactive viewer: a stdlib-only HTTP server streaming rendered frames.

The TPU-native replacement for the reference's interactive app layer
(main.gd + the vendored imgui-godot overlay): the browser is the display and
input device; this process owns the rasterizer AND the camera. Feature
parity with the ImGui panel (main.gd:34-75):

  * live FPS / frame-ms, loaded file, splat & pair counts w/ overflow flag,
    memory use, render size, per-stage timings, camera state → /stats JSON
  * sliders: render scale, model scale, FOV; heatmap & pause checkboxes
  * camera basis Override / Reset buttons (main.gd:63-68) + camera Reset
  * drag-and-drop .ply loading (main.gd:29-30) via POST /load
  * pause-on-idle power saver (main.gd:146-152)

Camera parity (util/camera.gd, driven by viewer/controller.py SERVER-side —
the browser only streams raw input):

  * RMB: true in-place free-look; WASDQE fly with accel 30 / drag -10 /
    vel 4 / shift x2.5 / alt x0.4 (camera.gd:104-128)
  * LMB held > 0.135 s: orbit mode around the focus point with the
    swing-to-face transition (OrbitSwapTimer, main.tscn:48-51;
    camera.gd:36-42,130-138); quick LMB click: splat pick → focus
    (main.gd:86-91)
  * wheel: zoom in 0.25 steps, min distance 0.75 (camera.gd:75-81)

Security: binds 127.0.0.1 by default; pass --host 0.0.0.0 explicitly to
expose it (POSTs mutate renderer state and /load accepts model uploads).

Run: python -m godotgaussiansplatting_tpu.viewer [model.ply] [--port 8000]
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ..engine.rasterizer import Rasterizer
from ..utils.image import encode_jpeg_fallback_png
from .controller import FreeLookController, InputState

ORBIT_SWAP_S = 0.135   # main.tscn:48-51 OrbitSwapTimer wait_time

_PAGE = """<!DOCTYPE html>
<html><head><title>gsplat-tpu viewer</title><style>
body{margin:0;background:#111;color:#ddd;font:13px monospace;display:flex}
#view{flex:1;display:flex;align-items:center;justify-content:center;height:100vh}
#img{max-width:100%;max-height:100vh;cursor:crosshair}
#panel{width:330px;padding:12px;background:#1a1a1f;overflow-y:auto}
#panel h3{margin:8px 0 4px;color:#8cf}
#panel label{display:block;margin:5px 0}
#panel button{margin:2px;background:#2a2a33;color:#ddd;border:1px solid #444}
input[type=range]{width:150px;vertical-align:middle}
pre{color:#aaa;white-space:pre-wrap}
#loadbar{position:fixed;top:0;left:0;height:4px;background:#6cf;width:0%;
 transition:width .3s;z-index:9}
#cursor{position:absolute;width:14px;height:14px;border:2px solid #fff;
 border-radius:50%;box-shadow:0 0 6px #000;pointer-events:none;display:none;
 transform:translate(-50%,-50%);
 /* move tween: 0.2s ease-out circ (util/cursor.gd:20) */
 transition:left .2s cubic-bezier(0,.55,.45,1),top .2s cubic-bezier(0,.55,.45,1),
  opacity .1s linear}
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
 <div>Camera Basis:
  <button id=override>Override</button>
  <button id=breset>Reset</button></div>
 <div><button id=camreset>Reset Camera</button></div>
 <div>RMB drag: free-look · WASDQE: fly (shift fast / alt slow) ·
 LMB drag: orbit · LMB click: focus · wheel: zoom</div>
</div>
<script>
const img = document.getElementById('img');
let ui = {fov:75, rscale:1, mscale:1, heatmap:0, pause:1};
let uiDirty = true;
let keys = {}, dx = 0, dy = 0, wheel = 0, lmb = 0, rmb = 0;
let pick = null, lastCx = 0, lastCy = 0;
function post(u,b){return fetch(u,{method:'POST',body:JSON.stringify(b)})}
img.addEventListener('mousedown', e => {
  if (e.button === 2) rmb = 1; else if (e.button === 0) lmb = 1;
  e.preventDefault();});
window.addEventListener('mouseup', e => {
  if (e.button === 2) rmb = 0;
  else if (e.button === 0) {
    lmb = 0;
    const r = img.getBoundingClientRect();
    pick = {x:(e.clientX-r.left)/r.width, y:(e.clientY-r.top)/r.height};
  }});
window.addEventListener('mousemove', e => {
  if (lmb || rmb) { dx += e.movementX; dy += e.movementY; }});
img.addEventListener('contextmenu', e=>e.preventDefault());
img.addEventListener('wheel', e => {wheel += e.deltaY>0?1:-1; e.preventDefault();});
let guiVisible = true;
window.addEventListener('keydown', e=>{
  keys[e.key.toLowerCase()]=1;
  if (e.repeat) return;
  // main.gd:77-84 hotkeys: H toggles the GUI (panel + cursor + load bar),
  // F toggles fullscreen, ESC returns to windowed
  if (e.key.toLowerCase() === 'h') {
    guiVisible = !guiVisible;
    document.getElementById('panel').style.display = guiVisible?'block':'none';
    document.getElementById('loadbar').style.visibility =
      guiVisible?'visible':'hidden';
    if (!guiVisible) document.getElementById('cursor').style.display='none';
  } else if (e.key.toLowerCase() === 'f') {
    if (document.fullscreenElement) document.exitFullscreen();
    else document.documentElement.requestFullscreen();
  } else if (e.key === 'Escape' && document.fullscreenElement) {
    document.exitFullscreen();
  }});
window.addEventListener('keyup', e=>{keys[e.key.toLowerCase()]=0;});
setInterval(()=>{
  const b = {keys:{w:keys['w']||0, a:keys['a']||0, s:keys['s']||0,
                   d:keys['d']||0, q:keys['q']||0, e:keys['e']||0,
                   shift:keys['shift']||0, alt:keys['alt']||0},
             dx:dx, dy:dy, wheel:wheel, lmb:lmb, rmb:rmb, pick:pick};
  dx = 0; dy = 0; wheel = 0; pick = null;
  post('/input', b);
}, 33);
for (const id of ['heatmap','pause']) document.getElementById(id).onchange =
  e => {ui[id]=e.target.checked?1:0; uiDirty=true;};
for (const id of ['rscale','mscale','fov']) document.getElementById(id).oninput =
  e => {ui[id]=parseFloat(e.target.value);
        document.getElementById(id+'_v').textContent=e.target.value; uiDirty=true;};
document.getElementById('override').onclick = ()=>post('/basis',{op:'override'});
document.getElementById('breset').onclick = ()=>post('/basis',{op:'reset'});
document.getElementById('camreset').onclick = ()=>post('/camreset',{});
window.addEventListener('dragover', e=>e.preventDefault());
window.addEventListener('drop', async e => {
  e.preventDefault();
  const f = e.dataTransfer.files[0];
  if (f && f.name.endsWith('.ply'))
    await fetch('/load', {method:'POST', body: await f.arrayBuffer()});
});
async function loop(){
  while(true){
    if(uiDirty){ uiDirty=false; await post('/state', ui); }
    const r = await fetch('/frame');
    img.src = URL.createObjectURL(await r.blob());
    const s = await (await fetch('/stats')).json();
    document.getElementById('stats').textContent = s.panel;
    document.getElementById('loadbar').style.width =
      (s.progress < 1 ? (s.progress*100)+'%' : '0%');
    document.getElementById('override').disabled = s.has_override;
    document.getElementById('breset').disabled = !s.has_override;
    const cur = document.getElementById('cursor');
    if (s.cursor && guiVisible) {
      const rr = img.getBoundingClientRect();
      const nx = s.cursor[0]*rr.width, ny = s.cursor[1]*rr.height;
      const wasHidden = cur.style.display !== 'block';
      const jump = Math.hypot(nx-lastCx, ny-lastCy);
      cur.style.display = 'block';
      if (wasHidden) {  // cursor.gd:13: alpha==0 → jump without tween
        cur.style.transition = 'opacity .1s linear';
        cur.style.left = nx+'px'; cur.style.top = ny+'px';
        void cur.offsetWidth;  // flush so the move isn't animated
        cur.style.transition = '';
      } else {
        cur.style.left = nx+'px'; cur.style.top = ny+'px';
        if (jump > 12) {  // squash & stretch along motion (cursor.gd:21-25)
          const a = Math.atan2(ny-lastCy, nx-lastCx);
          const k = Math.min(1.0, jump*0.02);
          cur.style.transform = 'translate(-50%,-50%) rotate('+a+'rad)'
            + ' scale('+(1+k)+','+(1/(1+k))+')';
          setTimeout(()=>{cur.style.transform =
            'translate(-50%,-50%) rotate('+a+'rad) scale(1,1)';}, 75);
          setTimeout(()=>{cur.style.transform =
            'translate(-50%,-50%)';}, 160);
        }
      }
      lastCx = nx; lastCy = ny;
      cur.style.opacity = s.cursor_alpha;
    } else cur.style.display = 'none';
  }
}
loop();
</script></body></html>"""


class ViewerState:
    """Server-side camera + UI state. The FreeLookController integrates the
    reference camera physics from raw input ticks (camera.gd parity)."""

    def __init__(self, rasterizer: Rasterizer):
        self.r = rasterizer
        self.lock = threading.Lock()
        self.ctl = FreeLookController()
        self.mode = FreeLookController.NONE
        self.lmb_down_at = None
        self.cursor_world = None      # focus point, Godot world frame
        self.cursor_set_at = -1e9
        self.fov = 75.0
        self.pause_allowed = True
        self.last_change = time.monotonic()
        self.last_tick = time.monotonic()
        self.frame_png = encode_jpeg_fallback_png(
            np.zeros((8, 8, 3), np.float32))
        self.fps = 30.0

    # -- UI state (sliders / checkboxes, main.gd:49-62) ---------------------

    def apply_ui(self, st: dict):
        with self.lock:
            self.fov = float(st.get("fov", self.fov))
            self.r.should_enable_heatmap = bool(st.get("heatmap", 0))
            self.pause_allowed = bool(st.get("pause", 1))
            rs = float(st.get("rscale", self.r.render_scale))
            if abs(rs - self.r.render_scale) > 1e-6:
                self.r.render_scale = rs
            self.r.model_scale = float(st.get("mscale", self.r.model_scale))
            self.last_change = time.monotonic()

    # -- input tick (camera.gd:44-101 + main.gd:86-91) ----------------------

    def apply_input(self, b: dict):
        now = time.monotonic()
        with self.lock:
            dt = min(now - self.last_tick, 0.1)
            self.last_tick = now
            k = b.get("keys", {})
            lmb, rmb = b.get("lmb", 0), b.get("rmb", 0)

            # Mode state machine: RMB → free-look immediately; LMB → orbit
            # after the 0.135 s swap timer; LMB release below the timer is a
            # pick (handled via b["pick"], sent by the client on mouseup).
            if rmb:
                self.mode = FreeLookController.FREE_LOOK
                self.lmb_down_at = None
            elif lmb:
                if self.lmb_down_at is None:
                    self.lmb_down_at = now
                    self.mode = FreeLookController.NONE
                elif (self.mode != FreeLookController.ORBIT
                      and now - self.lmb_down_at >= ORBIT_SWAP_S):
                    self.ctl.start_orbit()
                    self.mode = FreeLookController.ORBIT
            else:
                self.mode = FreeLookController.NONE
                self.lmb_down_at = None

            inputs = InputState(
                forward=bool(k.get("w")), back=bool(k.get("s")),
                left=bool(k.get("a")), right=bool(k.get("d")),
                down=bool(k.get("q")), up=bool(k.get("e")),
                shift=bool(k.get("shift")), alt=bool(k.get("alt")),
                mouse_dx=float(b.get("dx", 0)),
                mouse_dy=float(b.get("dy", 0)))
            moved = (any([inputs.forward, inputs.back, inputs.left,
                          inputs.right, inputs.up, inputs.down])
                     or inputs.mouse_dx or inputs.mouse_dy
                     or float(np.abs(self.ctl.velocity).max()) > 1e-4
                     or self.ctl.orbit_time < 0.4)
            self.ctl.update(dt, inputs, self.mode, fps=max(self.fps, 1.0))

            w = int(b.get("wheel", 0))
            if w:
                self.ctl.zoom(-w)
                moved = True
            if moved:
                self.last_change = now

            pick = b.get("pick")
        if pick and self.mode == FreeLookController.NONE:
            self._pick(pick)

    def _pick(self, p):
        w, h = self.r.texture_size
        pos = self.r.get_splat_position(
            (p["x"] * w / max(self.r.render_scale, 1e-6),
             p["y"] * h / max(self.r.render_scale, 1e-6)))
        if np.all(np.isfinite(pos)):
            with self.lock:
                # godot frame: (-x, -y, z) applied by get_splat_position
                self.ctl.set_focused_position(pos)
                self.cursor_world = np.asarray(pos, np.float32)
                self.cursor_set_at = time.monotonic()
                self.last_change = time.monotonic()

    def cursor_screen(self):
        """Screen fraction of the world-space cursor (the reference cursor is
        a world-anchored capsule, util/cursor.gd — it tracks the scene as the
        camera moves, unlike a screen-pinned marker). None if unset/behind."""
        if self.cursor_world is None:
            return None
        import dataclasses
        cam = dataclasses.replace(self.ctl.camera, fov_y=self.fov,
                                  basis_override=self.r.basis_override)
        w, h = self.r.texture_size
        view = cam.view_matrix()
        proj = cam.projection_matrix(w, h)
        # invert get_splat_position's host transform: godot → scaled-PLY frame
        ply = np.diag([-1.0, -1.0, 1.0]).astype(np.float32) @ (
            self.r.basis_override @ self.cursor_world)
        vp = view[:3, :3] @ ply + view[:3, 3]
        clip = proj[:3, :3] @ vp + proj[:3, 3]
        cw = float(proj[3, :3] @ vp + proj[3, 3])
        if cw <= 1e-6:
            return None
        return [float(clip[0] / cw) * 0.5 + 0.5,
                float(clip[1] / cw) * 0.5 + 0.5]

    # -- discrete buttons -----------------------------------------------------

    def basis(self, op: str):
        with self.lock:
            if op == "override":
                # main.gd:66: override = (camera_basis · current_override)⁻¹
                b = self.ctl.camera.basis @ self.r.basis_override
                self.r.basis_override = np.linalg.inv(b).astype(np.float32)
            else:
                self.r.basis_override = np.eye(3, dtype=np.float32)
            self.last_change = time.monotonic()

    def cam_reset(self):
        with self.lock:
            self.ctl.reset()
            self.cursor_world = None
            self.last_change = time.monotonic()

    # -- render loop ----------------------------------------------------------

    def render_loop(self):
        """Background render thread with the reference's pause-on-idle
        behavior (main.gd:146-152)."""
        while True:
            idle = (time.monotonic() - self.last_change) > 2.0
            if idle and self.pause_allowed and self.r.is_loaded:
                time.sleep(0.5)
                continue
            with self.lock:
                import dataclasses
                self.r.camera = dataclasses.replace(self.ctl.camera,
                                                    fov_y=self.fov)
            t0 = time.perf_counter()
            try:
                self.r.rasterize(sync=True)
                img = self.r.image()
            except Exception:
                time.sleep(0.5)
                continue
            self.fps = 1.0 / max(time.perf_counter() - t0, 1e-6)
            self.frame_png = encode_jpeg_fallback_png(img)

    # -- stats panel (main.gd:38-75, 93-119) ----------------------------------

    def panel_text(self) -> str:
        info = self.r.debug_info()
        cam = self.ctl.camera
        lines = [
            f"FPS:             {self.fps:5.1f} ({1e3 / max(self.fps, 1e-6):.2f}ms)",
            f"Loaded:          {'(loading...)' if not info['is_loaded'] else 'yes'}"
            f" {info['num_splats_loaded']}/{info['num_splats']}",
            f"Rendered Splats: {info.get('rendered_splats', 0)}"
            + (" (buffer overflow!)" if info.get("buffer_overflow") else ""),
            f"Rendered Size:   {info['texture_size']}",
            f"VRAM Used:       {info.get('memory_used', 'n/a')}",
            "", "Stage Timings",
        ] + info["timing_lines"] + [
            "", "Camera",
            "Cursor Position: "
            f"{np.round(self.ctl.orbit_position, 2).tolist()}",
            f"Camera Position: {np.round(cam.position, 2).tolist()}",
            f"Camera Mode:     {self.mode.replace('_', ' ').title()}",
        ]
        return "\n".join(lines)


def make_server(rasterizer: Rasterizer, port: int = 8000,
                host: str = "127.0.0.1"):
    """Build the HTTP server without entering serve_forever (testable;
    port=0 binds an ephemeral port). Returns (httpd, state)."""
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
                # cursor alpha envelope matches util/cursor.gd:26-29:
                # fade in to 0.35 over 0.25 s, hold, fade out over 0.5 s
                # after a 2.0 s delay
                age = time.monotonic() - state.cursor_set_at
                if age < 0.25:
                    alpha = 0.35 * (age / 0.25)
                elif age < 2.0:
                    alpha = 0.35
                else:
                    alpha = 0.35 * max(0.0, 1.0 - (age - 2.0) / 0.5)
                self._send(200, json.dumps({
                    "panel": state.panel_text(),
                    "progress": prog,
                    "cursor": (state.cursor_screen()
                               if alpha > 0.0 else None),
                    "cursor_alpha": round(alpha, 4),
                    "has_override": bool(
                        np.any(state.r.basis_override
                               != np.eye(3, dtype=np.float32))),
                }).encode())
            else:
                self._send(404, b"{}")

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            if self.path == "/input":
                state.apply_input(json.loads(body))
            elif self.path == "/state":
                state.apply_ui(json.loads(body))
            elif self.path == "/basis":
                state.basis(json.loads(body).get("op", "reset"))
            elif self.path == "/camreset":
                state.cam_reset()
            elif self.path == "/load":
                state.r.cleanup()
                # Rebuild at the UNSCALED base resolution: texture_size is
                # the render_scale-scaled target, so passing it would
                # compound the downscale on every load.
                base = (state.r._cfg.width, state.r._cfg.height)
                rs = state.r.render_scale
                state.r = Rasterizer(bytes(body), texture_size=base,
                                     stream=True, quality=state.r.quality)
                state.r.render_scale = rs
                state.last_change = time.monotonic()
            self._send(200, b"{}")

    httpd = ThreadingHTTPServer((host, port), Handler)
    return httpd, state


def serve(rasterizer: Rasterizer, port: int = 8000,
          host: str = "127.0.0.1"):
    httpd, _ = make_server(rasterizer, port, host)
    print(f"viewer at http://{host}:{httpd.server_address[1]}/")
    httpd.serve_forever()
