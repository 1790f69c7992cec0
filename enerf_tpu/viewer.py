"""Interactive viewer: orbit camera, interleaved train/render, web UI.

Parity: reference nerf/gui.py — OrbitCamera (:10-60), the render loop that
interleaves 16 training steps with progressive-SPP preview renders
(trainer.train_gui/test_gui, utils.py:807-918), and dynamic resolution
scaling targeting a per-frame time budget (gui.py:119-148, 200 ms default).

TPU design: the display layer is a tiny dependency-free HTTP server (this
image has no dearpygui/display); the render/train mechanics are identical
and fully testable headless.  `TurntableRecorder` writes an orbit video's
frames to disk as the non-interactive equivalent.
"""

import math
import time

import numpy as np


class OrbitCamera:
    """Orbit camera with the reference's pose convention (gui.py:10-60)."""

    def __init__(self, W, H, r=5.0, fovy=50.0):
        self.W, self.H = W, H
        self.radius = r
        self.fovy = fovy
        self.center = np.zeros(3, np.float64)
        self.yaw = 0.0
        self.pitch = 0.0

    @property
    def intrinsics(self):
        focal = self.H / (2.0 * math.tan(math.radians(self.fovy) / 2.0))
        return (focal, focal, self.W / 2.0, self.H / 2.0)

    @property
    def pose(self):
        """c2w, right-down-forward (matches data/rays.py)."""
        cy, sy = math.cos(self.yaw), math.sin(self.yaw)
        cp, sp = math.cos(self.pitch), math.sin(self.pitch)
        eye = self.center + self.radius * np.asarray(
            [cy * cp, sy * cp, sp]
        )
        f = self.center - eye
        f = f / np.linalg.norm(f)
        up = np.asarray([0.0, 0.0, 1.0])
        r = np.cross(f, up)
        r = r / max(np.linalg.norm(r), 1e-9)
        d = np.cross(f, r)
        pose = np.eye(4)
        pose[:3, 0], pose[:3, 1], pose[:3, 2], pose[:3, 3] = r, d, f, eye
        return pose

    def orbit(self, dx, dy):
        self.yaw += 2.0 * math.pi * dx / self.W
        self.pitch = float(np.clip(
            self.pitch + math.pi * dy / self.H, -1.5, 1.5
        ))

    def scale(self, delta):
        self.radius *= 1.1 ** (-delta)

    def pan(self, dx, dy, dz=0.0):
        p = self.pose
        self.center += 5e-4 * (p[:3, :3] @ np.asarray([dx, dy, dz])) * self.radius


class GUIRenderer:
    """Interleaved training + progressive preview (reference train_gui /
    test_gui, utils.py:807-918 + gui.py:119-148)."""

    def __init__(self, trainer, provider=None, W=640, H=360, radius=5.0,
                 fovy=50.0, max_spp=64, frame_budget_ms=200.0):
        self.trainer = trainer
        self.provider = provider
        self.cam = OrbitCamera(W, H, r=radius, fovy=fovy)
        self.max_spp = max_spp
        self.frame_budget_ms = frame_budget_ms
        self.downscale = 1.0
        self.spp = 0
        self._accum = None
        self._seen_shapes = set()
        self.training = provider is not None
        import jax
        self._key = jax.random.PRNGKey(0)

    def train_steps(self, n=16):
        """reference Trainer.train_gui: n training steps, returns mean loss.

        Keeps the occupancy grid live (the reference's train_gui calls
        update_extra_state on the 16-step cadence, utils.py:833-836) and
        invalidates the progressive-SPP accumulation so the preview shows
        the UPDATED model instead of blending stale checkpoints forever
        (reference gui.py sets need_update=True after training)."""
        import jax
        tr = self.trainer
        losses = []
        for _ in range(n):
            if tr.occupancy is not None and int(tr.state.step) % 16 == 0:
                from enerf_tpu.render.occupancy import update_occupancy
                self._key, ko = jax.random.split(self._key)
                tr.occupancy = update_occupancy(
                    tr.state.params, tr.static, tr.occupancy, ko,
                    density_scale=tr.cfg.density_scale,
                    density_thresh=tr.cfg.density_thresh,
                )
            self._key, k1, k2 = jax.random.split(self._key, 3)
            batch = self.provider.train_step_batch(k1)
            aux = tr._step_fn(batch, k2)
            losses.append(float(aux["loss"]))
        self.reset_view()  # model changed: restart SPP accumulation
        return float(np.mean(losses))

    def reset_view(self):
        self.spp = 0
        self._accum = None

    def render_frame(self):
        """One preview frame with progressive SPP accumulation + dynamic
        resolution targeting the frame budget.  Returns [H, W, C] float."""
        t0 = time.time()
        H = max(int(self.cam.H * self.downscale) // 8 * 8, 16)
        W = max(int(self.cam.W * self.downscale) // 8 * 8, 16)
        img, _ = self.trainer.render_view(self.cam.pose, OrbitCamera(
            W, H, self.cam.radius, self.cam.fovy
        ).intrinsics, H, W)
        dt_ms = (time.time() - t0) * 1000.0
        # the first frame at a new resolution pays one-time XLA compile —
        # excluding it from the budget keeps compile spikes from slamming
        # downscale to the floor
        compiled_shape = (H, W) in self._seen_shapes
        self._seen_shapes.add((H, W))

        if self._accum is None or self._accum.shape[:2] != (H, W):
            self._accum = img
            self.spp = 1
        elif self.spp < self.max_spp:
            self._accum = (self._accum * self.spp + img) / (self.spp + 1)
            self.spp += 1

        # dynamic downscale in [1/4, 1] (gui.py:131-140); only steady-state
        # frames (shape already compiled) inform the controller
        if self.spp <= 1 and compiled_shape:
            ratio = self.frame_budget_ms / max(dt_ms, 1e-3)
            self.downscale = float(
                np.clip(self.downscale * math.sqrt(ratio), 0.25, 1.0)
            )
        return self._accum


class TurntableRecorder:
    """Headless orbit recording (the non-interactive viewer)."""

    def __init__(self, trainer, W=320, H=180, radius=4.0, fovy=50.0):
        self.trainer = trainer
        self.W, self.H = W, H
        self.radius = radius
        self.fovy = fovy

    def record(self, out_dir, n_frames=30):
        import os
        import cv2

        os.makedirs(out_dir, exist_ok=True)
        cam = OrbitCamera(self.W, self.H, self.radius, self.fovy)
        for i in range(n_frames):
            cam.yaw = 2.0 * math.pi * i / n_frames
            img, _ = self.trainer.render_view(cam.pose, cam.intrinsics, self.H, self.W)
            img8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
            if img8.shape[-1] == 3:
                img8 = cv2.cvtColor(img8, cv2.COLOR_RGB2BGR)
            cv2.imwrite(os.path.join(out_dir, f"{i:04d}.png"), img8)
        return out_dir


def serve_web_viewer(gui, host="127.0.0.1", port=7007):
    """Minimal single-file web viewer: drag to orbit, scroll to zoom.

    Serves JPEG frames over HTTP; training keeps running between frames
    when a provider is attached (the reference GUI's interleaving).
    """
    import io
    import json
    from http.server import BaseHTTPRequestHandler, HTTPServer

    import cv2

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            if self.path.startswith("/frame"):
                if gui.training:
                    gui.train_steps(16)
                img = gui.render_frame()
                img8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
                if img8.shape[-1] == 1:
                    img8 = np.repeat(img8, 3, -1)
                ok, buf = cv2.imencode(".jpg", cv2.cvtColor(img8, cv2.COLOR_RGB2BGR))
                self.send_response(200)
                self.send_header("Content-Type", "image/jpeg")
                self.end_headers()
                self.wfile.write(buf.tobytes())
            elif self.path.startswith("/orbit"):
                import urllib.parse
                q = urllib.parse.parse_qs(self.path.split("?", 1)[-1])
                gui.cam.orbit(float(q.get("dx", [0])[0]), float(q.get("dy", [0])[0]))
                gui.cam.scale(float(q.get("dz", [0])[0]))
                gui.reset_view()
                self.send_response(200)
                self.end_headers()
            else:
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(_VIEWER_HTML.encode())

    server = HTTPServer((host, port), Handler)
    print(f"viewer at http://{host}:{port}")
    server.serve_forever()


_VIEWER_HTML = """<!doctype html><html><body style="margin:0;background:#111">
<img id=v style="width:100vw;height:100vh;object-fit:contain">
<script>
const v=document.getElementById('v');let drag=false,lx=0,ly=0;
v.onmousedown=e=>{drag=true;lx=e.x;ly=e.y};
window.onmouseup=()=>drag=false;
window.onmousemove=e=>{if(drag){fetch(`/orbit?dx=${e.x-lx}&dy=${e.y-ly}`);lx=e.x;ly=e.y}};
window.onwheel=e=>fetch(`/orbit?dz=${e.deltaY>0?-1:1}`);
(async function loop(){while(true){v.src='/frame?'+Date.now();
await new Promise(r=>{v.onload=r;v.onerror=r});}})();
</script></body></html>"""
