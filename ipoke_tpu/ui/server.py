"""Interactive poke UI (reference ``testing/gui.py`` — PyQt5 — rebuilt as a
zero-dependency web app).

Serves a canvas with the start frame; a mouse drag defines the poke (position
+ displacement); the server stamps the poke map (same ``poke_size`` window
semantics as training), runs the second stage's sampling path, and returns
the generated frames as base64 PNGs for client-side playback.

    python -m ipoke_tpu.ui.server --config <second_stage cfg> \
        --model_name <name> --data_root <dir> [--port 8000]

Endpoints: GET / (page), GET /frame (new start frame), POST /poke
({x, y, dx, dy, n_frames}) -> {frames: [b64 png, ...]}, POST /save ->
{files: [...]}: writes the current video as mp4 + enrollment PNG under
``<generated>/gui/id_<k>/`` and, once per start frame, the ground-truth
clip plus ``n_gt_pokes`` dataset-simulated GT-poke comparison videos
(reference ``testing/gui.py:217-320`` save_video / generate_gt_poke_vid).
"""

from __future__ import annotations

import argparse
import base64
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional

import numpy as np

_PAGE = """<!doctype html>
<html><head><title>ipoke_tpu — interactive poke</title><style>
body{font-family:sans-serif;background:#111;color:#eee;text-align:center}
canvas{image-rendering:pixelated;border:1px solid #555;cursor:crosshair}
button{margin:8px}
</style></head><body>
<h3>ipoke_tpu — drag on the image to poke</h3>
<canvas id=c width=%(disp)d height=%(disp)d></canvas><br>
<button onclick="newFrame()">new frame</button>
<button onclick="saveVid()">save video</button>
<span id=status></span>
<script>
const S=%(disp)d, c=document.getElementById('c'), ctx=c.getContext('2d');
let frames=[], playing=null, start=null, x0=null;
function draw(img64){const im=new Image();im.onload=()=>ctx.drawImage(im,0,0,S,S);
  im.src='data:image/png;base64,'+img64;}
function newFrame(){fetch('/frame').then(r=>r.json()).then(d=>{x0=d.frame;draw(x0);});}
function saveVid(){fetch('/save',{method:'POST',body:'{}'}).then(r=>r.json()).then(d=>{
  document.getElementById('status').textContent=d.error||('saved '+d.files.length+' files');});}
c.onmousedown=e=>{const r=c.getBoundingClientRect();start=[e.clientX-r.left,e.clientY-r.top];};
c.onmouseup=e=>{if(!start)return;const r=c.getBoundingClientRect();
 const end=[e.clientX-r.left,e.clientY-r.top];
 const body={x:start[0]/S,y:start[1]/S,dx:(end[0]-start[0])/S,dy:(end[1]-start[1])/S};
 start=null;document.getElementById('status').textContent='generating...';
 fetch('/poke',{method:'POST',body:JSON.stringify(body)}).then(r=>r.json()).then(d=>{
   frames=d.frames;let i=0;clearInterval(playing);
   playing=setInterval(()=>{draw(frames[i]);i=(i+1)%%frames.length;},200);
   document.getElementById('status').textContent='';});};
newFrame();
</script></body></html>"""


def _png_b64(img_u8: np.ndarray) -> str:
    import cv2

    ok, buf = cv2.imencode(".png", img_u8[..., ::-1])
    return base64.b64encode(buf.tobytes()).decode()


class PokeSession:
    """Holds the model + a current batch; turns UI pokes into videos."""

    def __init__(self, experiment, display_size: int = 256,
                 save_root: Optional[str] = None, n_gt_pokes: int = 3):
        from .. import cli  # noqa: F401  (experiment already built)

        self.experiment = experiment
        self.display_size = display_size
        self.spatial = experiment.config["data"]["spatial_size"][0]
        self.T = experiment.config["data"]["max_frames"]
        self.poke_size = int(experiment.config["data"].get("poke_size", 5))
        ui_cfg = experiment.config.get("ui", {}) if hasattr(
            experiment.config, "get") else {}
        self.n_gt_pokes = int(ui_cfg.get("n_gt_pokes", n_gt_pokes))
        self.save_root = save_root or (
            experiment.dirs["generated"] if getattr(experiment, "dirs", None)
            else os.path.join(os.getcwd(), "generated"))
        self._loader = None
        self.batch = None
        self.frame_id = -1
        self.save_count = 0
        self.current = None  # last generated {vid, poke} for /save
        self.new_frame()

    def new_frame(self):
        import jax.numpy as jnp

        if self._loader is None:
            self._loader = iter(
                self.experiment.datamodule.test_loader(n_batches=10**6))
        try:
            b = next(self._loader)
        except StopIteration:
            self._loader = None
            return self.new_frame()
        self.batch = {k: jnp.asarray(v[:1]) for k, v in b.items()}
        self.frame_id += 1
        self.save_count = 0
        self.current = None
        return self.frame_png()

    def frame_png(self) -> str:
        img = np.asarray(self.batch["images"][0, 0])
        u8 = ((img + 1) * 127.5).clip(0, 255).astype(np.uint8)
        import cv2

        u8 = cv2.resize(u8, (self.display_size, self.display_size),
                        interpolation=cv2.INTER_NEAREST)
        return _png_b64(u8)

    def poke(self, x: float, y: float, dx: float, dy: float):
        """Coordinates/displacement normalized to [0, 1] of the display."""
        import jax.numpy as jnp

        S = self.spatial
        r, c = int(np.clip(y * S, 0, S - 1)), int(np.clip(x * S, 0, S - 1))
        # displacement in input pixels (reference gui.py:326-350 rescales by
        # the display/input ratio)
        vec = np.asarray([dx * S, dy * S], np.float32)
        poke = np.zeros((S, S, 2), np.float32)
        half = self.poke_size // 2
        poke[max(0, r - half): r + half + 1,
             max(0, c - half): c + half + 1] = vec
        batch = dict(self.batch)
        batch["poke"] = jnp.asarray(poke[None])
        vid = self.experiment.model.forward_sample(
            self.experiment.state.params, self.experiment.frozen, batch,
            self.experiment.next_rng(), length=self.T)
        frames = np.asarray(vid[0])
        self.current = {"vid": frames, "poke": poke}
        out = []
        import cv2

        for f in frames:
            u8 = ((f + 1) * 127.5).clip(0, 255).astype(np.uint8)
            u8 = cv2.resize(u8, (self.display_size, self.display_size),
                            interpolation=cv2.INTER_NEAREST)
            out.append(_png_b64(u8))
        return out

    # -- save / GT-poke parity (reference testing/gui.py:217-320) ----------

    def _padded_video(self, x0, vid, poke, n_pad: int = 4):
        """[x0+poke-arrows] x n_pad, then the clip, then the last frame x
        n_pad (reference ``make_padded_video`` layout)."""
        from ..utils.video import draw_poke_arrows, to_uint8

        src = draw_poke_arrows(to_uint8(x0), poke)
        return np.concatenate([
            np.stack([src] * n_pad), to_uint8(vid),
            np.stack([to_uint8(vid[-1])] * n_pad)])

    def save_current(self):
        """Write the last generated video as mp4 + enrollment under
        ``<generated>/gui/id_<frame>/`` and, on the first save per start
        frame, the ground-truth clip + GT-poke comparison videos
        (reference save_video -> generate_gt_poke_vid chain)."""
        from ..utils.video import save_enrollment, save_video

        if self.current is None:
            raise ValueError("no video was generated yet — poke first")
        base = os.path.join(self.save_root, "gui", f"id_{self.frame_id}")
        os.makedirs(base, exist_ok=True)
        x0 = np.asarray(self.batch["images"][0, 0])
        files = []
        out = self._padded_video(x0, self.current["vid"],
                                 self.current["poke"])
        p = os.path.join(base, f"vid_{self.save_count}.mp4")
        save_video(out, p)
        files.append(p)
        files.append(save_enrollment(
            out, p[:-4] + "_enrollment.png", max_frames=len(out)))
        if self.save_count == 0:
            files += self._save_gt_pokes(base)
        self.save_count += 1
        return files

    def _save_gt_pokes(self, base: str):
        """Ground-truth clip + ``n_gt_pokes`` dataset-simulated pokes run
        through the model for side-by-side comparison (reference
        ``generate_gt_poke_vid``, gui.py:217-280)."""
        import jax.numpy as jnp

        from ..data.poke import simulate_poke
        from ..utils.video import save_enrollment, save_video, to_uint8

        files = []
        imgs = np.asarray(self.batch["images"][0])  # (T+1, H, W, 3)
        gt_pad = np.concatenate([
            np.stack([to_uint8(imgs[0])] * 8), to_uint8(imgs),
            np.stack([to_uint8(imgs[-1])] * 4)])
        p = os.path.join(base, "gt_vid.mp4")
        save_video(gt_pad, p)
        files.append(p)
        files.append(save_enrollment(gt_pad, p[:-4] + "_enrollment.png",
                                     max_frames=len(gt_pad)))
        if "flow" not in self.batch or self.n_gt_pokes <= 0:
            return files  # no GT flow available (e.g. encoder-only runs)
        flow = np.asarray(self.batch["flow"][0])
        rng = np.random.default_rng(self.frame_id)
        for i in range(self.n_gt_pokes):
            gt_poke, _ = simulate_poke(flow, rng, n_pokes_max=1,
                                       poke_size=self.poke_size)
            nb = dict(self.batch)
            nb["poke"] = jnp.asarray(gt_poke[None])
            vid = np.asarray(self.experiment.model.forward_sample(
                self.experiment.state.params, self.experiment.frozen, nb,
                self.experiment.next_rng(), length=self.T)[0])
            out = self._padded_video(imgs[0], vid, gt_poke)
            p = os.path.join(base, f"gt_poke_vid_{i}.mp4")
            save_video(out, p)
            files.append(p)
            files.append(save_enrollment(
                out, p[:-4] + "_enrollment.png", max_frames=len(out)))
        return files


def make_handler(session: PokeSession):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, payload, ctype="application/json"):
            body = payload.encode() if isinstance(payload, str) else payload
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/":
                self._send(_PAGE % {"disp": session.display_size},
                           "text/html")
            elif self.path == "/frame":
                self._send(json.dumps({"frame": session.new_frame()}))
            else:
                self.send_error(404)

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            if self.path == "/poke":
                req = json.loads(body)
                frames = session.poke(req["x"], req["y"], req["dx"],
                                      req["dy"])
                self._send(json.dumps({"frames": frames}))
            elif self.path == "/save":
                try:
                    files = session.save_current()
                    self._send(json.dumps({"files": files}))
                except ValueError as e:
                    self._send(json.dumps({"files": [], "error": str(e)}))
            else:
                self.send_error(404)

    return Handler


def serve(experiment, port: int = 8000, display_size: int = 256,
          background: bool = False, save_root: Optional[str] = None
          ) -> Optional[ThreadingHTTPServer]:
    session = PokeSession(experiment, display_size, save_root=save_root)
    httpd = ThreadingHTTPServer(("127.0.0.1", port), make_handler(session))
    if background:
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        return httpd
    print(f"ipoke_tpu UI on http://127.0.0.1:{port}")
    httpd.serve_forever()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--model_name", required=True)
    p.add_argument("--data_root", default=None)
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--display_size", type=int, default=256)
    args = p.parse_args()

    import main as cli_main
    from ..cli.experiments import select_experiment
    from ..cli.testing import _restore_trained

    config, dirs, data_root = cli_main.load_parameters(
        argparse.Namespace(
            config=args.config, model_name=args.model_name, test="samples",
            resume=False, last_ckpt=False, target_version=None,
            data_root=args.data_root, debug=False, devices=None, gpus=None))
    experiment = select_experiment(config)(config, dirs, data_root=data_root)
    _restore_trained(experiment)
    serve(experiment, args.port, args.display_size)


if __name__ == "__main__":
    main()
