"""Shared in-line replica of ``torchvision.models.vgg16/vgg19`` for oracle
parity tests (torchvision is absent in this image; random weights — the
porting correctness is what must be proven).

Install-once into ``sys.modules``: tests share one pytest process, so each
test module must NOT register its own partial fake (a ``setdefault`` after
another module's fake would silently win — r2 bugfix)."""

import sys
import types

_CFGS = {
    16: [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
         512, 512, 512, "M", 512, 512, 512, "M"],
    19: [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
         512, 512, 512, 512, "M", 512, 512, 512, 512, "M"],
}


def _make_features(depth):
    import torch.nn as tnn

    layers, cin = [], 3
    for v in _CFGS[depth]:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers += [tnn.Conv2d(cin, v, 3, padding=1),
                       tnn.ReLU(inplace=True)]
            cin = v
    return tnn.Sequential(*layers)


def install_fake_torchvision():
    """Idempotent; always (re)binds vgg16+vgg19 so partial fakes can't mask
    each other."""
    tv = sys.modules.get("torchvision")
    if tv is None:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
    tv.models.vgg16 = lambda pretrained=False, **kw: types.SimpleNamespace(
        features=_make_features(16))
    tv.models.vgg19 = lambda pretrained=False, **kw: types.SimpleNamespace(
        features=_make_features(19))
    return tv
