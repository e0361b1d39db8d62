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


def _make_resnet(depth):
    """Faithful torchvision-resnet replica (module names conv1/bn1/layerX.Y
    .convZ/bnZ/downsample.{0,1}/avgpool/fc) — enough for the reference's
    ResnetEncoder, which swaps fc and never calls the classifier."""
    import torch
    import torch.nn as tnn

    class BasicBlock(tnn.Module):
        expansion = 1

        def __init__(self, cin, planes, stride=1, down=None):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, planes, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.downsample = down
            self.relu = tnn.ReLU(inplace=True)

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return self.relu(out + idt)

    class Bottleneck(tnn.Module):
        expansion = 4

        def __init__(self, cin, planes, stride=1, down=None):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(planes * 4)
            self.downsample = down
            self.relu = tnn.ReLU(inplace=True)

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            return self.relu(out + idt)

    plans = {18: (BasicBlock, (2, 2, 2, 2)), 34: (BasicBlock, (3, 4, 6, 3)),
             50: (Bottleneck, (3, 4, 6, 3)),
             101: (Bottleneck, (3, 4, 23, 3))}
    block, plan = plans[depth]

    class ResNet(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU(inplace=True)
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            cin = 64
            for i, (planes, n) in enumerate(zip((64, 128, 256, 512), plan)):
                blocks = []
                for j in range(n):
                    stride = 2 if (i > 0 and j == 0) else 1
                    down = None
                    if stride != 1 or cin != planes * block.expansion:
                        down = tnn.Sequential(
                            tnn.Conv2d(cin, planes * block.expansion, 1,
                                       stride, bias=False),
                            tnn.BatchNorm2d(planes * block.expansion))
                    blocks.append(block(cin, planes, stride, down))
                    cin = planes * block.expansion
                setattr(self, f"layer{i + 1}", tnn.Sequential(*blocks))
            self.avgpool = tnn.AdaptiveAvgPool2d((1, 1))
            self.fc = tnn.Linear(cin, 1000)

    return ResNet()


def install_fake_torchvision():
    """Idempotent; always (re)binds vgg16/vgg19/resnets + transforms so
    partial fakes can't mask each other."""
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
    for d in (18, 34, 50, 101):
        setattr(tv.models, f"resnet{d}",
                (lambda dd: lambda pretrained=False, **kw:
                 _make_resnet(dd))(d))

    trans = types.ModuleType("torchvision.transforms")

    class Normalize:
        def __init__(self, mean, std):
            self.mean, self.std = mean, std

        def __call__(self, x):
            import torch

            m = torch.tensor(self.mean).view(-1, 1, 1)
            s = torch.tensor(self.std).view(-1, 1, 1)
            return (x - m) / s

    class Compose:
        def __init__(self, fns):
            self.fns = fns

        def __call__(self, x):
            for f in self.fns:
                x = f(x)
            return x

    class Lambda:
        def __init__(self, fn):
            self.fn = fn

        def __call__(self, x):
            return self.fn(x)

    trans.Normalize = Normalize
    trans.Compose = Compose
    trans.Lambda = Lambda
    tv.transforms = trans
    sys.modules["torchvision.transforms"] = trans
    return tv
