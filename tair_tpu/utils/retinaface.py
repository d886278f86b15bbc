"""RetinaFace-ResNet50 face/landmark detector (Flax, inference).

Counterpart of the reference's facexlib `retinaface_resnet50` detector
(/root/reference/terediff/utils/face.py:7,56,196-243): the face-restoration
helper needs 5-point landmarks per face; facexlib runs the
biubug6/Pytorch_Retinaface architecture — torchvision-layout ResNet-50
backbone (C3/C4/C5 taps), 3-level FPN, SSH context modules, and per-level
class/bbox/landmark heads over 2 anchors, decoded against SSD-style priors
(variances 0.1/0.2) and filtered with confidence + NMS.

The LEARNED weights are external (`detection_Resnet50_Final.pth`, facexlib
layout) — `RetinaFaceDetector.from_torch(path)`; the graph and converter
are forward-parity-tested against a torch mirror (tests/test_retinaface.py).
Detection is host-side preprocessing for the face pipeline (the reference
also runs it outside the diffusion loop), so the network runs wherever the
metric arrays live; priors/decode/NMS are numpy.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .clipiqa import BNInfer

Dtype = Any

# facexlib preprocessing: BGR, mean-subtracted, 0-255 scale
BGR_MEAN = (104.0, 117.0, 123.0)


def _conv(features, kernel, stride=1, name=None, use_bias=False):
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        padding=[(kernel // 2, kernel // 2)] * 2, use_bias=use_bias,
        param_dtype=jnp.float32, name=name,
    )


class TorchBottleneck(nn.Module):
    """torchvision ResNet Bottleneck: stride on conv2, strided-conv
    downsample (unlike CLIP's avg-pool variant in clipiqa.py)."""

    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        out = nn.relu(BNInfer(name="bn1")(_conv(self.planes, 1, name="conv1")(x)))
        out = nn.relu(BNInfer(name="bn2")(
            _conv(self.planes, 3, self.stride, name="conv2")(out)))
        out = BNInfer(name="bn3")(_conv(self.planes * 4, 1, name="conv3")(out))
        identity = x
        if self.stride != 1 or x.shape[-1] != self.planes * 4:
            identity = BNInfer(name="down_bn")(
                nn.Conv(self.planes * 4, (1, 1), strides=(self.stride,) * 2,
                        use_bias=False, param_dtype=jnp.float32,
                        name="down_conv")(x)
            )
        return nn.relu(out + identity)


class ResNet50Backbone(nn.Module):
    """torchvision resnet50 through layer4, returning (C3, C4, C5)."""

    layers: Tuple[int, ...] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                    use_bias=False, param_dtype=jnp.float32, name="conv1")(x)
        x = nn.relu(BNInfer(name="bn1")(x))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        taps = []
        for stage, n_blocks in enumerate(self.layers):
            planes = 64 * (2 ** stage)
            for blk in range(n_blocks):
                stride = 2 if (stage > 0 and blk == 0) else 1
                x = TorchBottleneck(planes, stride,
                                    name=f"layer{stage + 1}_{blk}")(x)
            if stage >= 1:
                taps.append(x)
        return tuple(taps)  # C3 (512), C4 (1024), C5 (2048)


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True

    @nn.compact
    def __call__(self, x):
        x = BNInfer(name="bn")(
            _conv(self.features, self.kernel, self.stride, name="conv")(x))
        # facexlib uses LeakyReLU(0) for out_channels > 64, i.e. plain relu
        return nn.relu(x) if self.relu else x


class SSH(nn.Module):
    """SSH context module: 3x3 + stacked-3x3 (5x5/7x7 receptive fields)."""

    features: int

    @nn.compact
    def __call__(self, x):
        f = self.features
        c3 = ConvBN(f // 2, relu=False, name="conv3x3")(x)
        c5_1 = ConvBN(f // 4, name="conv5x5_1")(x)
        c5 = ConvBN(f // 4, relu=False, name="conv5x5_2")(c5_1)
        c7_1 = ConvBN(f // 4, name="conv7x7_2")(c5_1)
        c7 = ConvBN(f // 4, relu=False, name="conv7x7_3")(c7_1)
        return nn.relu(jnp.concatenate([c3, c5, c7], axis=-1))


@dataclass(frozen=True)
class RetinaFaceConfig:
    out_channels: int = 256
    num_anchors: int = 2
    min_sizes: Tuple[Tuple[int, ...], ...] = ((16, 32), (64, 128), (256, 512))
    steps: Tuple[int, ...] = (8, 16, 32)
    variances: Tuple[float, float] = (0.1, 0.2)


class RetinaFace(nn.Module):
    cfg: RetinaFaceConfig = RetinaFaceConfig()

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, 3] BGR mean-subtracted. Returns (scores [B,N,2]
        softmaxed, boxes [B,N,4], landmarks [B,N,10]) over all anchors."""
        f = self.cfg.out_channels
        c3, c4, c5 = ResNet50Backbone(name="body")(x)

        o3 = ConvBN(f, kernel=1, name="fpn_output3")(c5)
        o2 = ConvBN(f, kernel=1, name="fpn_output2")(c4)
        o2 = o2 + jax.image.resize(o3, o2.shape, "nearest")
        o2 = ConvBN(f, name="fpn_merge2")(o2)
        o1 = ConvBN(f, kernel=1, name="fpn_output1")(c3)
        o1 = o1 + jax.image.resize(o2, o1.shape, "nearest")
        o1 = ConvBN(f, name="fpn_merge1")(o1)

        feats = [SSH(f, name=f"ssh{i + 1}")(o)
                 for i, o in enumerate((o1, o2, o3))]

        na = self.cfg.num_anchors
        cls, box, ldm = [], [], []
        for i, feat in enumerate(feats):
            b = feat.shape[0]
            cls.append(_conv(na * 2, 1, name=f"class_head{i}", use_bias=True)(
                feat).reshape(b, -1, 2))
            box.append(_conv(na * 4, 1, name=f"bbox_head{i}", use_bias=True)(
                feat).reshape(b, -1, 4))
            ldm.append(_conv(na * 10, 1, name=f"ldm_head{i}", use_bias=True)(
                feat).reshape(b, -1, 10))
        scores = jax.nn.softmax(jnp.concatenate(cls, axis=1), axis=-1)
        return scores, jnp.concatenate(box, 1), jnp.concatenate(ldm, 1)


# --------------------------------------------------------------------------
# priors / decode / NMS (host-side numpy, biubug6 prior_box + decode)
# --------------------------------------------------------------------------


from functools import lru_cache


@lru_cache(maxsize=16)
def _priors_cached(height: int, width: int, cfg: RetinaFaceConfig) -> np.ndarray:
    out = []
    for k, step in enumerate(cfg.steps):
        fh = int(np.ceil(height / step))
        fw = int(np.ceil(width / step))
        ii, jj = np.meshgrid(np.arange(fh), np.arange(fw), indexing="ij")
        for ms in cfg.min_sizes[k]:
            grid = np.stack(
                [
                    (jj + 0.5) * step / width, (ii + 0.5) * step / height,
                    np.full_like(jj, ms / width, np.float64),
                    np.full_like(ii, ms / height, np.float64),
                ],
                axis=-1,
            ).reshape(-1, 4)
            out.append(grid)
        # interleave min_sizes per cell (biubug6 prior order: cell-major,
        # then anchor)
        per_cell = np.stack(out[-len(cfg.min_sizes[k]):], axis=1)
        out = out[: -len(cfg.min_sizes[k])] + [per_cell.reshape(-1, 4)]
    return np.concatenate(out, axis=0).astype(np.float32)


def priors_for(height: int, width: int, cfg: RetinaFaceConfig) -> np.ndarray:
    """SSD priors [N, 4] (cx, cy, w, h), normalized to [0,1]; cached per
    (H, W) — directory evals at fixed resolution reuse one grid."""
    return _priors_cached(height, width, cfg)


def decode_boxes(deltas: np.ndarray, priors: np.ndarray, variances) -> np.ndarray:
    """[N,4] SSD decode -> [N,4] (x0,y0,x1,y1) normalized."""
    cxy = priors[:, :2] + deltas[:, :2] * variances[0] * priors[:, 2:]
    wh = priors[:, 2:] * np.exp(deltas[:, 2:] * variances[1])
    return np.concatenate([cxy - wh / 2, cxy + wh / 2], axis=1)


def decode_landmarks(deltas: np.ndarray, priors: np.ndarray, variances) -> np.ndarray:
    """[N,10] -> [N,10] normalized (5 x/y pairs)."""
    out = [
        priors[:, :2] + deltas[:, 2 * i : 2 * i + 2] * variances[0] * priors[:, 2:]
        for i in range(5)
    ]
    return np.concatenate(out, axis=1)


def nms(boxes: np.ndarray, scores: np.ndarray, thresh: float) -> List[int]:
    """Plain IoU NMS (py_cpu_nms semantics)."""
    x0, y0, x1, y1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x1 - x0) * (y1 - y0)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx0 = np.maximum(x0[i], x0[order[1:]])
        yy0 = np.maximum(y0[i], y0[order[1:]])
        xx1 = np.minimum(x1[i], x1[order[1:]])
        yy1 = np.minimum(y1[i], y1[order[1:]])
        inter = np.maximum(xx1 - xx0, 0) * np.maximum(yy1 - yy0, 0)
        iou = inter / np.maximum(areas[i] + areas[order[1:]] - inter, 1e-12)
        order = order[1:][iou <= thresh]
    return keep


class RetinaFaceDetector:
    """detect(img [H,W,3] RGB float [0,1]) -> [K, 15] rows
    (x0,y0,x1,y1,score, 5 landmark x/y pairs) in pixels — the facexlib
    detect_faces contract the reference consumes (face.py:209-226)."""

    def __init__(self, params, cfg: RetinaFaceConfig = RetinaFaceConfig()):
        self.net = RetinaFace(cfg)
        self.params = params
        self.cfg = cfg
        self._apply = jax.jit(
            lambda p, x: self.net.apply({"params": p}, x)
        )

    def detect(self, img: np.ndarray, conf_threshold: float = 0.8,
               nms_threshold: float = 0.4) -> np.ndarray:
        h, w, _ = img.shape
        # pad to the coarsest stride so prior grids match the feature maps
        step = self.cfg.steps[-1]
        ph, pw = (-h) % step, (-w) % step
        bgr = (np.asarray(img, np.float32)[..., ::-1] * 255.0
               - np.asarray(BGR_MEAN, np.float32))
        x = np.pad(bgr, ((0, ph), (0, pw), (0, 0)))
        scores, boxes, ldms = jax.device_get(
            self._apply(self.params, jnp.asarray(x)[None])
        )
        conf = scores[0, :, 1]
        priors = priors_for(h + ph, w + pw, self.cfg)
        keep = conf > conf_threshold
        if not keep.any():
            return np.zeros((0, 15), np.float32)
        scale = np.asarray([w + pw, h + ph], np.float32)
        bxs = decode_boxes(boxes[0, keep], priors[keep], self.cfg.variances)
        bxs = bxs * np.tile(scale, 2)
        lms = decode_landmarks(ldms[0, keep], priors[keep], self.cfg.variances)
        lms = lms * np.tile(scale, 5)
        cf = conf[keep]
        kept = nms(bxs, cf, nms_threshold)
        rows = np.concatenate(
            [bxs[kept], cf[kept, None], lms[kept]], axis=1
        ).astype(np.float32)
        return rows

    def as_landmark_detector(self, conf_threshold: float = 0.8):
        """Adapter for FaceRestoreHelper.detector: img -> list of [5,2]."""

        def fn(img: np.ndarray) -> List[np.ndarray]:
            rows = self.detect(img, conf_threshold)
            return [r[5:15].reshape(5, 2) for r in rows]

        return fn

    @classmethod
    def from_torch(cls, path: str) -> "RetinaFaceDetector":
        """path: facexlib `detection_Resnet50_Final.pth` state dict."""
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        sd = {k.removeprefix("module."): v for k, v in sd.items()}
        return cls.from_state_dict(sd)

    @classmethod
    def from_state_dict(cls, sd) -> "RetinaFaceDetector":
        from ..weights.convert import convert_retinaface

        sd = {k: np.asarray(v.float().numpy() if hasattr(v, "numpy") else v)
              for k, v in sd.items()}
        return cls(convert_retinaface(sd))
