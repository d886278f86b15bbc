"""RetinaFace: forward parity vs a torch mirror + decode/NMS invariants.

The oracle is a torch mirror of the biubug6/Pytorch_Retinaface architecture
that facexlib ships (upstream source not vendored in this environment), in
the facexlib state-dict key layout — validating the converter and the Flax
graph. Reference consumer: /root/reference/terediff/utils/face.py:196-243.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")


def _torch_retinaface():
    import torch
    import torch.nn.functional as F
    from torch import nn

    def conv_bn(inp, oup, k=3, stride=1, relu=True):
        mods = [
            nn.Conv2d(inp, oup, k, stride, k // 2, bias=False),
            nn.BatchNorm2d(oup),
        ]
        if relu:
            mods.append(nn.LeakyReLU(0.0))
        return nn.Sequential(*mods)

    class Bottleneck(nn.Module):
        def __init__(self, inplanes, planes, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes * 4)
            self.downsample = None
            if stride != 1 or inplanes != planes * 4:
                self.downsample = nn.Sequential(
                    nn.Conv2d(inplanes, planes * 4, 1, stride, bias=False),
                    nn.BatchNorm2d(planes * 4),
                )

        def forward(self, x):
            out = F.relu(self.bn1(self.conv1(x)))
            out = F.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            idn = x if self.downsample is None else self.downsample(x)
            return F.relu(out + idn)

    class Body(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            inplanes = 64
            for stage, n in enumerate((3, 4, 6, 3)):
                planes = 64 * (2 ** stage)
                blocks = []
                for blk in range(n):
                    stride = 2 if (stage > 0 and blk == 0) else 1
                    blocks.append(Bottleneck(inplanes, planes, stride))
                    inplanes = planes * 4
                setattr(self, f"layer{stage + 1}", nn.Sequential(*blocks))

        def forward(self, x):
            x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
            x = self.layer1(x)
            c3 = self.layer2(x)
            c4 = self.layer3(c3)
            c5 = self.layer4(c4)
            return c3, c4, c5

    class SSH(nn.Module):
        def __init__(self, inp, oup):
            super().__init__()
            self.conv3X3 = conv_bn(inp, oup // 2, relu=False)
            self.conv5X5_1 = conv_bn(inp, oup // 4)
            self.conv5X5_2 = conv_bn(oup // 4, oup // 4, relu=False)
            self.conv7X7_2 = conv_bn(oup // 4, oup // 4)
            self.conv7x7_3 = conv_bn(oup // 4, oup // 4, relu=False)

        def forward(self, x):
            c3 = self.conv3X3(x)
            c5_1 = self.conv5X5_1(x)
            c5 = self.conv5X5_2(c5_1)
            c7 = self.conv7x7_3(self.conv7X7_2(c5_1))
            return F.relu(torch.cat([c3, c5, c7], dim=1))

    class FPN(nn.Module):
        def __init__(self, ins, out):
            super().__init__()
            self.output1 = conv_bn(ins[0], out, k=1)
            self.output2 = conv_bn(ins[1], out, k=1)
            self.output3 = conv_bn(ins[2], out, k=1)
            self.merge1 = conv_bn(out, out)
            self.merge2 = conv_bn(out, out)

        def forward(self, c3, c4, c5):
            o3 = self.output3(c5)
            o2 = self.output2(c4)
            o2 = self.merge2(o2 + F.interpolate(o3, size=o2.shape[2:], mode="nearest"))
            o1 = self.output1(c3)
            o1 = self.merge1(o1 + F.interpolate(o2, size=o1.shape[2:], mode="nearest"))
            return o1, o2, o3

    def head(oup):
        m = nn.Module()
        m.conv1x1 = nn.Conv2d(256, oup, 1)
        m.forward = lambda x: m.conv1x1(x)
        return m

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.body = Body()
            self.fpn = FPN((512, 1024, 2048), 256)
            self.ssh1 = SSH(256, 256)
            self.ssh2 = SSH(256, 256)
            self.ssh3 = SSH(256, 256)
            self.ClassHead = nn.ModuleList([head(4) for _ in range(3)])
            self.BboxHead = nn.ModuleList([head(8) for _ in range(3)])
            self.LandmarkHead = nn.ModuleList([head(20) for _ in range(3)])

        def forward(self, x):
            feats = self.fpn(*self.body(x))
            feats = [self.ssh1(feats[0]), self.ssh2(feats[1]), self.ssh3(feats[2])]
            b = x.shape[0]

            def flat(t, d):
                return t.permute(0, 2, 3, 1).reshape(b, -1, d)

            cls = torch.cat([flat(self.ClassHead[i](f), 2) for i, f in enumerate(feats)], 1)
            box = torch.cat([flat(self.BboxHead[i](f), 4) for i, f in enumerate(feats)], 1)
            ldm = torch.cat([flat(self.LandmarkHead[i](f), 10) for i, f in enumerate(feats)], 1)
            return F.softmax(cls, dim=-1), box, ldm

    return Net()


def _randomize_bn(model, seed=0):
    import torch

    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)
            m.weight.data.copy_(torch.randn(m.num_features, generator=g) * 0.2 + 1)
            m.bias.data.copy_(torch.randn(m.num_features, generator=g) * 0.1)


@pytest.fixture(scope="module")
def nets():
    import torch

    torch.manual_seed(0)
    tnet = _torch_retinaface()
    with torch.no_grad():
        _randomize_bn(tnet)
    tnet.eval()
    from tair_tpu.utils.retinaface import RetinaFaceDetector

    det = RetinaFaceDetector.from_state_dict(
        {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    )
    return tnet, det


def test_retinaface_forward_parity(nets):
    import torch

    tnet, det = nets
    rs = np.random.RandomState(1)
    x = rs.randn(1, 64, 96, 3).astype(np.float32) * 20.0
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out = det._apply(det.params, jnp.asarray(x))
    for o, r in zip(out, ref):
        np.testing.assert_allclose(
            np.asarray(o), r.numpy(), rtol=3e-3, atol=3e-4
        )


def test_priors_decode_nms_invariants():
    from tair_tpu.utils.retinaface import (
        RetinaFaceConfig, decode_boxes, decode_landmarks, nms, priors_for,
    )

    cfg = RetinaFaceConfig()
    pri = priors_for(64, 96, cfg)
    counts = sum(
        int(np.ceil(64 / s)) * int(np.ceil(96 / s)) * 2 for s in cfg.steps
    )
    assert pri.shape == (counts, 4)
    # zero deltas decode to the prior box / prior center
    zero = np.zeros((pri.shape[0], 4), np.float32)
    boxes = decode_boxes(zero, pri, cfg.variances)
    np.testing.assert_allclose(boxes[:, 2] - boxes[:, 0], pri[:, 2], atol=1e-6)
    lms = decode_landmarks(np.zeros((pri.shape[0], 10), np.float32), pri, cfg.variances)
    np.testing.assert_allclose(lms[:, 0:2], pri[:, 0:2], atol=1e-6)
    # NMS suppresses a near-duplicate, keeps a disjoint box
    b = np.asarray([[0, 0, 10, 10], [1, 1, 10.5, 10.5], [20, 20, 30, 30]], np.float32)
    s = np.asarray([0.9, 0.8, 0.7], np.float32)
    assert nms(b, s, 0.4) == [0, 2]


def test_detector_contract_and_helper_integration(nets):
    _, det = nets
    rs = np.random.RandomState(2)
    img = rs.rand(70, 90, 3).astype(np.float32)
    rows = det.detect(img, conf_threshold=0.0, nms_threshold=0.4)
    assert rows.ndim == 2 and rows.shape[1] == 15
    assert np.isfinite(rows).all()
    # scores sorted output not required; confidence column within (0,1)
    assert ((rows[:, 4] >= 0) & (rows[:, 4] <= 1)).all()

    # adapter feeds FaceRestoreHelper (landmarks [5,2])
    from tair_tpu.utils.face import FaceRestoreHelper

    helper = FaceRestoreHelper(detector=det.as_landmark_detector(0.0))
    n = helper.detect_faces(img)
    assert n == len(helper.landmarks)
    if n:
        assert helper.landmarks[0].shape == (5, 2)
