"""End-to-end restoration pipeline (the val.py hot path, fully jittable).

Capability parity with the reference inference stack
(/root/reference/val.py:99-181): LQ -> SwinIR cleaner -> prepare_condition ->
50-step spaced sampling -> VAE decode -> clamp. The whole chain compiles to
one XLA program per (shape, steps) pair; the text-spotting feedback variant
(val_sample) lives in sampler/spaced.py + spotter/ and plugs in through
`feedback_fn`.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .diffusion.schedules import DiffusionSchedule
from .models.cldm import ControlLDM
from .models.swinir import SwinIR
from .sampler.spaced import SpacedSampler

Params = Any


@dataclass(frozen=True)
class TeReDiff:
    """The flagship model bundle: cleaner + ControlLDM (+ spotter, separate)."""

    cldm: ControlLDM
    swinir: SwinIR
    schedule: DiffusionSchedule

    @classmethod
    def create(cls, cldm: ControlLDM, swinir: SwinIR) -> "TeReDiff":
        return cls(
            cldm=cldm,
            swinir=swinir,
            schedule=DiffusionSchedule.create(
                timesteps=1000,
                beta_schedule="linear",
                linear_start=0.00085,
                linear_end=0.0120,
                zero_snr=True,
            ),
        )

    def init(self, rng: jax.Array, latent_hw: int = 8) -> Params:
        k1, k2 = jax.random.split(rng)
        params = self.cldm.init(k1, latent_hw=latent_hw)
        img = jnp.zeros((1, latent_hw * 8, latent_hw * 8, 3))
        params["swinir"] = self.swinir.init(k2, img)["params"]
        return params

    def sampler(self, rescale_cfg: bool = False) -> SpacedSampler:
        return SpacedSampler(
            training_betas=self.schedule.betas,
            parameterization="v",
            rescale_cfg=rescale_cfg,
        )

    # ---- stages -----------------------------------------------------------

    def clean(self, params: Params, lq: jnp.ndarray) -> jnp.ndarray:
        """LQ [0,1] NHWC -> cleaned [0,1] (clipped)."""
        out = self.swinir.apply({"params": params["swinir"]}, lq)
        return jnp.clip(out, 0.0, 1.0)

    def restore(
        self,
        params: Params,
        lq: jnp.ndarray,
        prompt_tokens: jnp.ndarray,
        rng: jax.Array,
        steps: int = 50,
        cfg_scale: float = 1.0,
        feat_iterations: Tuple[int, ...] = (),
    ):
        """Full restoration: returns (restored [0,1], clean, feats).

        prompt_tokens: [B, 77] int32 (tokenized on host).
        """
        clean = self.clean(params, lq)
        cond = dict(
            c_txt=self.cldm.clip_encode_tokens(params, prompt_tokens),
            c_img=self.cldm.vae_encode(params, clean * 2.0 - 1.0, sample=False),
        )
        b, h, w, _ = lq.shape
        zh, zw = h // 8, w // 8
        k_noise, k_chain = jax.random.split(rng)
        x_T = jax.random.normal(k_noise, (b, zh, zw, 4), jnp.float32)

        model_fn = partial(self.cldm.apply, params)
        x0, feats = self.sampler().sample(
            model_fn,
            steps=steps,
            x_T=x_T,
            cond=cond,
            rng=k_chain,
            cfg_scale=cfg_scale,
            feat_iterations=feat_iterations,
        )
        restored = self.cldm.vae_decode(params, x0)
        return jnp.clip((restored + 1.0) / 2.0, 0.0, 1.0), clean, feats


def build_default_model(dtype=jnp.bfloat16) -> TeReDiff:
    """Production TAIR geometry (SD-2.1 + SwinIR-TAIR)."""
    from .models.clip import CLIPTextConfig
    from .models.swinir import SwinIRConfig
    from .models.unet import UNetConfig
    from .models.vae import VAEConfig

    cldm = ControlLDM.create(
        unet_cfg=UNetConfig(),
        vae_cfg=VAEConfig(),
        clip_cfg=CLIPTextConfig(),
        dtype=dtype,
    )
    return TeReDiff.create(cldm=cldm, swinir=SwinIR(SwinIRConfig(), dtype=dtype))


def build_tiny_model(dtype=jnp.float32) -> TeReDiff:
    """Small geometry for tests/CI: same topology, tiny widths."""
    from .models.clip import CLIPTextConfig
    from .models.swinir import SwinIRConfig
    from .models.unet import UNetConfig
    from .models.vae import VAEConfig

    unet_cfg = UNetConfig(
        model_channels=32, num_head_channels=16, context_dim=64
    )
    cldm = ControlLDM.create(
        unet_cfg=unet_cfg,
        vae_cfg=VAEConfig(ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=1),
        clip_cfg=CLIPTextConfig(width=64, heads=4, layers=3),
        dtype=dtype,
    )
    swinir = SwinIR(
        SwinIRConfig(
            embed_dim=16, depths=(2,), num_heads=(2,), window_size=4, num_feat=8
        ),
        dtype=dtype,
    )
    return TeReDiff.create(cldm=cldm, swinir=swinir)
