"""Interactive web UI: drive GET /, /frame, POST /poke over real HTTP."""

import base64
import json
import os
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np

from ipoke_tpu.ui.server import PokeSession, serve

K = jax.random.PRNGKey


class _StubLoaderDM:
    def __init__(self, batches):
        self.batches = batches

    def test_loader(self, n_batches=None):
        return iter(self.batches)


class _StubExperiment:
    """Minimal experiment facade for the UI session."""

    def __init__(self):
        from ipoke_tpu.data.synthetic import make_batch
        from ipoke_tpu.models.second_stage import (
            SecondStageModel,
            create_second_stage_state,
        )
        from ipoke_tpu.core.optim import flow_adam
        from tests.test_second_stage import SS_CFG, _make_frozen

        fs_model, cond, poke, frozen = _make_frozen()
        self.model = SecondStageModel(SS_CFG, fs_model, cond, poke)
        self.state = create_second_stage_state(K(0), self.model,
                                               flow_adam(1e-3))
        self.frozen = frozen
        self.config = SS_CFG
        rng = np.random.default_rng(0)
        batches = [make_batch(rng, batch_size=1, n_frames=3, spatial_size=32)
                   for _ in range(3)]
        self.datamodule = _StubLoaderDM(batches)
        self._rng = jax.random.PRNGKey(7)

    def next_rng(self):
        self._rng, k = jax.random.split(self._rng)
        return k


def test_ui_server_end_to_end(tmp_path):
    exp = _StubExperiment()
    httpd = serve(exp, port=0, display_size=64, background=True,
                  save_root=str(tmp_path))
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        page = urllib.request.urlopen(base + "/", timeout=30).read().decode()
        assert "drag on the image to poke" in page

        frame = json.loads(
            urllib.request.urlopen(base + "/frame", timeout=30).read())
        png = base64.b64decode(frame["frame"])
        assert png[:8] == b"\x89PNG\r\n\x1a\n"

        req = urllib.request.Request(
            base + "/poke",
            data=json.dumps({"x": 0.5, "y": 0.5, "dx": 0.2,
                             "dy": -0.1}).encode(),
            method="POST")
        out = json.loads(urllib.request.urlopen(req, timeout=300).read())
        assert len(out["frames"]) == 3  # max_frames
        for f in out["frames"]:
            assert base64.b64decode(f)[:8] == b"\x89PNG\r\n\x1a\n"

        # /save: mp4 + enrollment for the poked video, plus (first save for
        # this frame) the GT clip and GT-poke comparison videos
        # (reference testing/gui.py:217-320 parity)
        save_req = urllib.request.Request(base + "/save", data=b"{}",
                                          method="POST")
        saved = json.loads(urllib.request.urlopen(save_req,
                                                  timeout=600).read())
        names = {os.path.basename(f) for f in saved["files"]}
        assert "vid_0.mp4" in names
        assert "vid_0_enrollment.png" in names
        assert "gt_vid.mp4" in names and "gt_vid_enrollment.png" in names
        assert "gt_poke_vid_0.mp4" in names  # dataset-simulated GT pokes
        assert "gt_poke_vid_2.mp4" in names
        for f in saved["files"]:
            assert os.path.exists(f) and os.path.getsize(f) > 0, f
        # gui/id_<frame> layout (the /frame fetch above advanced to id 1)
        assert os.path.dirname(saved["files"][0]).endswith("gui/id_1")

        # second save of the same frame: only the new vid_1 artifacts
        saved2 = json.loads(urllib.request.urlopen(save_req,
                                                   timeout=600).read())
        names2 = {os.path.basename(f) for f in saved2["files"]}
        assert names2 == {"vid_1.mp4", "vid_1_enrollment.png"}
    finally:
        httpd.shutdown()


def test_ui_save_before_poke_reports_error(tmp_path):
    exp = _StubExperiment()
    httpd = serve(exp, port=0, display_size=64, background=True,
                  save_root=str(tmp_path))
    port = httpd.server_address[1]
    try:
        req = urllib.request.Request(f"http://127.0.0.1:{port}/save",
                                     data=b"{}", method="POST")
        out = json.loads(urllib.request.urlopen(req, timeout=60).read())
        assert out["files"] == [] and "poke first" in out["error"]
    finally:
        httpd.shutdown()
