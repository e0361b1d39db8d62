"""Interactive web UI: drive GET /, /frame, POST /poke over real HTTP."""

import base64
import json
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


def test_ui_server_end_to_end():
    exp = _StubExperiment()
    httpd = serve(exp, port=0, display_size=64, background=True)
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
    finally:
        httpd.shutdown()
