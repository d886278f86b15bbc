"""ControlLDM: UNet + ControlNet + VAE + CLIP composite.

Capability parity with /root/reference/terediff/model/cldm.py:20-217 —
prepare_condition (CLIP text + VAE-encoded cleaner output), the controlled
forward applying 13 control scales, and latent scaling — expressed as a plain
(non-Module) composite over four Flax modules so the parameter pytree stays a
flat dict {unet, controlnet, vae, clip}: trivial to freeze per training
stage, shard with pjit, and checkpoint with orbax.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ..ops import quant
from .clip import CLIPTextConfig, CLIPTextTower
from .tokenizer import tokenize
from .unet import ControlNet, UNetConfig, UNetModel
from .vae import AutoencoderKL, VAEConfig

Params = Any


@dataclass(frozen=True)
class ControlLDM:
    unet: UNetModel
    controlnet: ControlNet
    vae: AutoencoderKL
    clip: CLIPTextTower
    scale_factor: float = 0.18215
    control_scales: Tuple[float, ...] = (1.0,) * 13
    # w8a8 serving quantization of the UNet+ControlNet step (ops/quant.py):
    # weights quantize in-graph (XLA hoists the int8 copy out of the sampler
    # scan -> the loop streams half the weight bytes), activations
    # dynamically per call, s8 x s8 -> s32 on the MXU. Inference-only
    # approximation knob like spotter_every/enc_topk; default exact.
    quantized: bool = False
    # static-PTQ activation scale (per-tensor abs-max as a trace-time
    # constant): removes the dynamic abs-max reduce that serializes w8a8
    # against the weight prefetch (ops/quant.py). One float = every site;
    # a tuple = per-site values in execution order, produced by
    # calibrate_quant() below. None = dynamic.
    quant_static_amax: Optional[Union[float, Tuple[float, ...]]] = None
    # selective w8a8 (ops/quant.selective): quantize only sites with
    # weight.size >= ratio * activation.size — captures the halved
    # weight-stream bytes on the big inner-block convs without paying the
    # activation quantize passes on the 64^2 outer blocks. None = all sites.
    quant_min_ratio: Optional[float] = None

    # ---- factory ------------------------------------------------------

    @classmethod
    def create(
        cls,
        unet_cfg: UNetConfig = UNetConfig(),
        vae_cfg: VAEConfig = VAEConfig(),
        clip_cfg: CLIPTextConfig = CLIPTextConfig(),
        controlnet_cfg: Optional[UNetConfig] = None,
        latent_scale_factor: float = 0.18215,
        dtype=jnp.float32,
        quantized: bool = False,
        quant_static_amax: Optional[float] = None,
        quant_min_ratio: Optional[float] = None,
    ) -> "ControlLDM":
        return cls(
            unet=UNetModel(unet_cfg, dtype=dtype),
            controlnet=ControlNet(controlnet_cfg or unet_cfg, dtype=dtype),
            vae=AutoencoderKL(vae_cfg, dtype=dtype),
            clip=CLIPTextTower(clip_cfg, dtype=dtype),
            scale_factor=latent_scale_factor,
            quantized=quantized,
            quant_static_amax=quant_static_amax,
            quant_min_ratio=quant_min_ratio,
        )

    def init(self, rng: jax.Array, latent_hw: int = 8) -> Params:
        """Initialize all four parameter trees (tiny spatial size; conv params
        are shape-independent of spatial dims)."""
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        s = latent_hw
        x = jnp.zeros((1, s, s, self.unet.cfg.in_channels))
        hint = jnp.zeros((1, s, s, self.controlnet.cfg.hint_channels))
        t = jnp.zeros((1,), jnp.int32)
        ctx = jnp.zeros((1, 77, self.unet.cfg.context_dim))
        img = jnp.zeros((1, s * 8, s * 8, 3))
        toks = jnp.zeros((1, 77), jnp.int32)
        return {
            "unet": self.unet.init(k1, x, t, ctx)["params"],
            "controlnet": self.controlnet.init(k2, x, hint, t, ctx)["params"],
            "vae": self.vae.init(k3, img)["params"],
            "clip": self.clip.init(k4, toks)["params"],
        }

    # ---- sub-model applies --------------------------------------------

    def vae_encode(
        self, params: Params, image: jnp.ndarray, rng=None, sample: bool = True
    ) -> jnp.ndarray:
        """image in [-1, 1] NHWC -> scaled latent."""
        mean, logvar = self.vae.apply(
            {"params": params["vae"]}, image, method=AutoencoderKL.encode_moments
        )
        if sample:
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mean.shape, mean.dtype
            )
        else:
            z = mean
        return z * self.scale_factor

    def vae_decode(self, params: Params, z: jnp.ndarray) -> jnp.ndarray:
        return self.vae.apply(
            {"params": params["vae"]}, z / self.scale_factor,
            method=AutoencoderKL.decode,
        )

    def clip_encode_tokens(self, params: Params, tokens: jnp.ndarray) -> jnp.ndarray:
        return self.clip.apply({"params": params["clip"]}, tokens)

    def clip_encode(self, params: Params, texts: Union[str, List[str]]) -> jnp.ndarray:
        return self.clip_encode_tokens(params, jnp.asarray(tokenize(texts)))

    def prepare_condition(
        self, params: Params, cond_img: jnp.ndarray, texts: Union[str, List[str]]
    ) -> Dict[str, jnp.ndarray]:
        """cond_img in [0,1] NHWC (cleaner output); texts are prompts.

        Mirrors /root/reference/terediff/model/cldm.py:143-158 (c_img uses the
        distribution mode, not a sample).
        """
        return dict(
            c_txt=self.clip_encode(params, texts),
            c_img=self.vae_encode(params, cond_img * 2.0 - 1.0, sample=False),
        )

    def calibrate_quant(
        self,
        params: Params,
        x_noisy: jnp.ndarray,
        t: jnp.ndarray,
        cond: Dict[str, jnp.ndarray],
        record: Optional[List[float]] = None,
    ) -> List[float]:
        """Static-PTQ calibration pass: per-site activation abs-max.

        Runs the UNet+ControlNet forward EAGERLY with dynamic w8a8 and
        records each conv/dense site's observed activation abs-max, in the
        deterministic execution order `quant_static_amax` consumes them in.
        Call repeatedly (passing the same `record`) over a calibration set
        to max-merge; feed the result back as
        `dataclasses.replace(cldm, quant_static_amax=tuple(record))`.
        """
        record = [] if record is None else record
        c_txt = cond["c_txt"]
        with quant.selective(self.quant_min_ratio), \
             quant.quantized(True, calibrate=record):
            if "c_img" in cond and cond["c_img"] is not None:
                control = self.controlnet.apply(
                    {"params": params["controlnet"]}, x_noisy, cond["c_img"], t, c_txt
                )
                control = tuple(c * s for c, s in zip(control, self.control_scales))
            else:
                control = None
            self.unet.apply(
                {"params": params["unet"]}, x_noisy, t, c_txt,
                control=control, extract_features=False,
            )
        return record

    # ---- main forward ---------------------------------------------------

    def apply(
        self,
        params: Params,
        x_noisy: jnp.ndarray,
        t: jnp.ndarray,
        cond: Dict[str, jnp.ndarray],
        extract_features: bool = True,
    ):
        """(x_t, t, cond) -> (model_output, extracted_feats).

        cond: {c_txt: [B,77,D], c_img: [B,h,w,4]} ; c_img optional (then the
        UNet runs uncontrolled, matching cldm.py:160-179).
        """
        c_txt = cond["c_txt"]
        with quant.selective(self.quant_min_ratio), \
             quant.quantized(self.quantized, static_act_amax=self.quant_static_amax):
            if "c_img" in cond and cond["c_img"] is not None:
                control = self.controlnet.apply(
                    {"params": params["controlnet"]}, x_noisy, cond["c_img"], t, c_txt
                )
                control = tuple(c * s for c, s in zip(control, self.control_scales))
            else:
                control = None
            return self.unet.apply(
                {"params": params["unet"]},
                x_noisy,
                t,
                c_txt,
                control=control,
                extract_features=extract_features,
            )
