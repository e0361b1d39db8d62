"""torch checkpoint -> npz conversion round trip (+ VGG loader format)."""

import numpy as np


def test_convert_torch_checkpoint(tmp_path):
    import torch

    from tools.convert_torch_checkpoint import convert

    net = torch.nn.Sequential(torch.nn.Conv2d(3, 8, 3), torch.nn.Linear(4, 2))
    ckpt = {"state_dict": {f"model.{k}": v
                           for k, v in net.state_dict().items()},
            "epoch": 3}
    p = str(tmp_path / "m.ckpt")
    torch.save(ckpt, p)
    out_path = str(tmp_path / "m.npz")
    out = convert(p, out_path)
    assert "0.weight" in out and out["0.weight"].shape == (8, 3, 3, 3)
    loaded = np.load(out_path)
    np.testing.assert_allclose(loaded["1.bias"],
                               net.state_dict()["1.bias"].numpy())


def test_vgg_npz_loader_shapes(tmp_path):
    import torch

    from ipoke_tpu.nn.vgg import _CFG, load_torch_vgg19_npz

    # synthesize a torchvision-layout vgg19.features state dict
    state = {}
    idx, cin = 0, 3
    for ch, n_convs in _CFG:
        for _ in range(n_convs):
            state[f"features.{idx}.weight"] = np.random.randn(
                ch, cin, 3, 3).astype(np.float32)
            state[f"features.{idx}.bias"] = np.zeros(ch, np.float32)
            cin = ch
            idx += 2
        idx += 1
    p = str(tmp_path / "vgg.npz")
    np.savez(p, **state)
    params = load_torch_vgg19_npz(p)
    assert params["params"]["conv1_1"]["kernel"].shape == (3, 3, 3, 64)
    assert params["params"]["conv5_1"]["kernel"].shape == (3, 3, 512, 512)

    # the loaded params drive the feature net
    import jax
    import jax.numpy as jnp

    from ipoke_tpu.nn.vgg import VGG19Features

    taps = VGG19Features().apply(params, jnp.zeros((1, 32, 32, 3)))
    assert len(taps) == 5
