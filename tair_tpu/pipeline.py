"""End-to-end restoration pipeline (the val.py hot path, fully jittable).

Capability parity with the reference inference stack
(/root/reference/val.py:99-181): LQ -> SwinIR cleaner -> prepare_condition ->
50-step spaced sampling -> VAE decode -> clamp. The whole chain compiles to
one XLA program per (shape, steps) pair; the text-spotting feedback variant
(val_sample) lives in sampler/spaced.py + spotter/ and plugs in through
`feedback_fn`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from .diffusion.schedules import DiffusionSchedule
from .models.cldm import ControlLDM
from .models.swinir import SwinIR
from .sampler.spaced import SpacedSampler
from .spotter.testr import TESTR, TESTRConfig

Params = Any


@dataclass(frozen=True)
class TeReDiff:
    """The flagship model bundle: cleaner + ControlLDM + TESTR spotter."""

    cldm: ControlLDM
    swinir: SwinIR
    schedule: DiffusionSchedule
    testr: Optional[TESTR] = None
    # per-instance cache of jitted step/spot/encode callables: defining fresh
    # @jax.jit wrappers on every restore_with_ocr_feedback call would retrace
    # (and without a persistent-cache hit, recompile) the full UNet+spotter
    # graphs for every image in an eval directory
    _jit_cache: dict = field(default_factory=dict, repr=False, compare=False)

    @classmethod
    def create(
        cls, cldm: ControlLDM, swinir: SwinIR, testr: Optional[TESTR] = None
    ) -> "TeReDiff":
        if testr is None:
            m = cldm.unet.cfg.model_channels
            mults = cldm.unet.cfg.channel_mult
            # decoder tap channels, deepest-first (unet.py extract_idx order)
            chans = tuple(
                m * mults[len(mults) - 1 - i] for i in range(len(mults))
            )
            testr = TESTR(TESTRConfig(in_channels=chans), dtype=cldm.unet.dtype)
        return cls(
            cldm=cldm,
            swinir=swinir,
            testr=testr,
            schedule=DiffusionSchedule.create(
                timesteps=1000,
                beta_schedule="linear",
                linear_start=0.00085,
                linear_end=0.0120,
                zero_snr=True,
            ),
        )

    def init(self, rng: jax.Array, latent_hw: int = 8) -> Params:
        k1, k2, k3 = jax.random.split(rng, 3)
        params = self.cldm.init(k1, latent_hw=latent_hw)
        img = jnp.zeros((1, latent_hw * 8, latent_hw * 8, 3))
        params["swinir"] = self.swinir.init(k2, img)["params"]
        if self.testr is not None:
            feats = self._dummy_feats(latent_hw)
            params["testr"] = self.testr.init(k3, feats)["params"]
        return params

    def _dummy_feats(self, latent_hw: int):
        cfg = self.cldm.unet.cfg
        m = cfg.model_channels
        n_lvl = len(cfg.channel_mult)
        feats = []
        for i in range(n_lvl):
            # tap i sits after the upsample of decoder level n_lvl-1-i
            ds = 2 ** max(0, n_lvl - 2 - i)
            ch = m * cfg.channel_mult[n_lvl - 1 - i]
            feats.append(jnp.zeros((1, latent_hw // ds, latent_hw // ds, ch)))
        return tuple(feats)

    def spotter_apply(self, params: Params, feats):
        return self.testr.apply({"params": params["testr"]}, feats)

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
        negative_tokens: Optional[jnp.ndarray] = None,
        rescale_cfg: bool = False,
    ):
        """Full restoration: returns (restored [0,1], clean, feats).

        prompt_tokens: [B, 77] int32 (tokenized on host); negative_tokens
        enables classifier-free guidance with cfg_scale > 1.
        """
        clean = self.clean(params, lq)
        c_img = self.cldm.vae_encode(params, clean * 2.0 - 1.0, sample=False)
        cond = dict(
            c_txt=self.cldm.clip_encode_tokens(params, prompt_tokens),
            c_img=c_img,
        )
        uncond = None
        if negative_tokens is not None:
            uncond = dict(
                c_txt=self.cldm.clip_encode_tokens(params, negative_tokens),
                c_img=c_img,
            )
        b, h, w, _ = lq.shape
        zh, zw = h // 8, w // 8
        k_noise, k_chain = jax.random.split(rng)
        x_T = jax.random.normal(k_noise, (b, zh, zw, 4), jnp.float32)

        model_fn = partial(self.cldm.apply, params)
        x0, feats = self.sampler(rescale_cfg=rescale_cfg).sample(
            model_fn,
            steps=steps,
            x_T=x_T,
            cond=cond,
            rng=k_chain,
            uncond=uncond,
            cfg_scale=cfg_scale,
            feat_iterations=feat_iterations,
        )
        restored = self.cldm.vae_decode(params, x0)
        return jnp.clip((restored + 1.0) / 2.0, 0.0, 1.0), clean, feats

    def restore_with_ocr_feedback(
        self,
        params: Params,
        lq: jnp.ndarray,
        rng: jax.Array,
        steps: int = 50,
        prompt_style: str = "CAPTION",
        score_threshold: float = 0.5,
        initial_prompt: str = "",
        progress: bool = False,
    ):
        """The flagship TAIR inference path (val_sample semantics,
        /root/reference/terediff/sampler/spaced_sampler.py:246-328): every
        denoising step runs the spotter on the UNet decoder features, decodes
        transcriptions on host, rebuilds the prompt, and re-encodes it as the
        next step's cross-attention conditioning.

        Diffusion step, spotter forward, and CLIP re-encode are each compiled
        once; only tokenization + string assembly run on host per step.
        Returns (restored [0,1], ts_results list of per-step dicts).
        """
        import numpy as np

        from .models.tokenizer import tokenize
        from .spotter.charset import decode_text
        from .spotter.testr import spotter_inference
        from .data.satext import make_caption, make_tag_prompt

        assert self.testr is not None
        sampler = self.sampler()
        sp = sampler.make_schedule(steps)
        b, h, w, _ = lq.shape

        clean = self.clean(params, lq)
        cond = dict(
            c_txt=self.cldm.clip_encode(params, [initial_prompt] * b),
            c_img=self.cldm.vae_encode(params, clean * 2.0 - 1.0, sample=False),
        )

        # params are jit ARGUMENTS, not closure captures (captured arrays
        # are lowered as constants: ~7GB baked into each executable); the
        # jitted callables are cached per (steps, threshold, size) so a
        # directory-wide eval traces each graph once, not once per image
        cache_key = ("ocr_feedback", steps, score_threshold, h, w)
        if cache_key not in self._jit_cache:

            @jax.jit
            def _step(params, x, step_idx, cond, step_rng):
                return sampler.p_sample(
                    partial(self.cldm.apply, params), sp, x, step_idx, cond,
                    None, 1.0, step_rng,
                )

            @jax.jit
            def _spot(params, feats):
                out = self.spotter_apply(params, feats)
                return spotter_inference(out, score_threshold, image_size=h)

            @jax.jit
            def _encode(params, tokens):
                return self.cldm.clip_encode_tokens(params, tokens)

            self._jit_cache[cache_key] = (_step, _spot, _encode)
        _step_fn, _spot_fn, _encode_fn = self._jit_cache[cache_key]

        def step_fn(x, step_idx, cond, step_rng):
            return _step_fn(params, x, step_idx, cond, step_rng)

        def spot_fn(feats):
            return _spot_fn(params, feats)

        def encode_fn(tokens):
            return _encode_fn(params, tokens)

        ts_results = []

        def feedback(feats, cond, i):
            res = jax.device_get(spot_fn(feats))
            prompts, step_info = [], []
            for bi in range(b):
                keep = res["keep"][bi]
                texts = [
                    decode_text(r) for r, k in zip(res["recs"][bi], keep) if k
                ]
                polys = res["polygons"][bi][keep].astype(np.int32)
                prompt = (
                    make_caption(texts)
                    if prompt_style == "CAPTION"
                    else make_tag_prompt(texts)
                )
                prompts.append(prompt)
                step_info.append(
                    dict(
                        timestep=int(sp.timesteps[sp.num_steps - 1 - i]),
                        pred_texts=texts,
                        pred_prompt=prompt,
                        pred_polys=polys,
                        scores=res["scores"][bi][keep],
                    )
                )
            cond = dict(cond, c_txt=encode_fn(jnp.asarray(tokenize(prompts))))
            ts_results.append(step_info)
            return cond, step_info

        k_noise, k_chain = jax.random.split(rng)
        x_T = jax.random.normal(k_noise, (b, h // 8, w // 8, 4), jnp.float32)
        x0, _ = sampler.val_sample_loop(
            step_fn, steps, x_T, cond, k_chain, feedback
        )
        restored = self.cldm.vae_decode(params, x0)
        return jnp.clip((restored + 1.0) / 2.0, 0.0, 1.0), ts_results

    def restore_fused_feedback(
        self,
        params: Params,
        lq: jnp.ndarray,
        rng: jax.Array,
        steps: int = 50,
        score_threshold: float = 0.5,
        max_words: int = 4,
        spotter_every: int = 1,
        return_spots: bool = False,
    ):
        """Fully-compiled TeReDiff loop: ONE lax.scan where every denoising
        step runs the spotter on the UNet features, assembles the predicted
        text into a TAG prompt ON DEVICE (models/prompt_splice.py), and
        re-encodes it through CLIP for the next step's cross-attention — the
        val_sample semantics with zero host round-trips. This is the serving/
        benchmark path; restore_with_ocr_feedback is the exact-parity
        (host-tokenized, CAPTION-template) variant.
        Returns (restored [0,1], final_tokens [B,77]); with
        return_spots=True additionally the LAST spotter decode (the dict
        spotter_inference returns, minus rec_scores) — the reference's
        val_sample exposes the same per-step predictions host-side
        (spaced_sampler.py:295-317), and serving/eval callers need the
        final one without paying a second spotter pass.
        """
        from .models.prompt_splice import splice_tag_prompt
        from .spotter.testr import spotter_inference

        assert self.testr is not None
        sampler = self.sampler()
        sp = sampler.make_schedule(steps)
        total = sp.num_steps
        b, h, w, _ = lq.shape

        from .models.tokenizer import empty_tokens

        clean = self.clean(params, lq)
        c_img = self.cldm.vae_encode(params, clean * 2.0 - 1.0, sample=False)
        tokens0 = jnp.asarray(empty_tokens(b))
        c_txt0 = self.cldm.clip_encode_tokens(params, tokens0)

        model_fn = partial(self.cldm.apply, params)
        k_noise, k_chain = jax.random.split(rng)
        x_T = jax.random.normal(k_noise, (b, h // 8, w // 8, 4), jnp.float32)

        tc = self.testr.cfg
        spots0 = {
            "scores": jnp.zeros((b, tc.num_proposals), jnp.float32),
            "keep": jnp.zeros((b, tc.num_proposals), bool),
            "polygons": jnp.zeros(
                (b, tc.num_proposals, tc.num_ctrl_points, 2), jnp.float32
            ),
            "recs": jnp.zeros((b, tc.num_proposals, tc.num_chars), jnp.int32),
        }

        def body(carry, i):
            x, c_txt, tokens, spots = carry
            cond = dict(c_txt=c_txt, c_img=c_img)
            x, feats = sampler.p_sample(
                model_fn, sp, x, total - 1 - i, cond, None, 1.0,
                jax.random.fold_in(k_chain, i),
            )

            def with_spotting(args):
                c_txt, tokens, _ = args
                out = self.spotter_apply(params, feats)
                res = spotter_inference(out, score_threshold, image_size=h)
                new_tokens = splice_tag_prompt(
                    res["recs"], res["scores"], res["keep"], max_words
                )
                # CLIP encode is deterministic: when the OCR'd prompt tokens
                # did not change, reuse the previous embedding (bit-identical;
                # the prompt typically stabilizes after the first few steps)
                new_c_txt = jax.lax.cond(
                    jnp.any(new_tokens != tokens),
                    lambda t: self.cldm.clip_encode_tokens(params, t),
                    lambda t: c_txt,
                    new_tokens,
                )
                new_spots = {k: res[k] for k in spots0}
                return new_c_txt, new_tokens, new_spots

            # spotter_every may be a TRACED scalar (passed as a jit argument)
            # so serving configs that differ only in refresh cadence share
            # one compiled executable — a large win through the remote
            # compile relay where each distinct program costs minutes
            if isinstance(spotter_every, int) and spotter_every == 1:
                c_txt, tokens, spots = with_spotting((c_txt, tokens, spots))
            else:
                # serving knob: refresh the OCR prompt every k-th step only
                # (the reference refreshes every step; k>1 trades a little
                # text-awareness for large speedups since the spotter costs
                # ~10x a UNet step)
                c_txt, tokens, spots = jax.lax.cond(
                    (i % spotter_every) == (spotter_every - 1),
                    with_spotting,
                    lambda a: a,
                    (c_txt, tokens, spots),
                )
            return (x, c_txt, tokens, spots), None

        (x0, _, tokens, spots), _ = jax.lax.scan(
            body, (x_T, c_txt0, tokens0, spots0), jnp.arange(total)
        )
        restored = self.cldm.vae_decode(params, x0)
        restored = jnp.clip((restored + 1.0) / 2.0, 0.0, 1.0)
        if return_spots:
            return restored, tokens, spots
        return restored, tokens

    def spotter_loss_fn(self, axis_name=None, criterion_cfg=None):
        """Adapter for train.step: (params, feats, batch) -> (loss, aux).
        criterion_cfg: optional CriterionConfig override (e.g. matcher
        selection — default is the exact on-device JV Hungarian)."""
        from .spotter.losses import CriterionConfig, set_criterion

        cfg = criterion_cfg if criterion_cfg is not None else CriterionConfig()

        def fn(params: Params, feats, batch):
            out = self.spotter_apply(params, feats)
            targets = {
                "inst_mask": batch["inst_mask"],
                "boxes": batch["boxes"],
                "ctrl_points": batch["ctrl_points"],
                "texts": batch["texts"],
            }
            losses = set_criterion(out, targets, cfg, axis_name)
            aux = {
                "loss_ocr_ce": losses["loss_ce"],
                "loss_ocr_ctrl_points": losses["loss_ctrl_points"],
                "loss_ocr_texts": losses["loss_texts"],
            }
            return losses["loss_total"], aux

        return fn


def cast_params_for_inference(params, dtype=jnp.bfloat16):
    """Cast weights to bf16 for serving: halves HBM weight traffic (the UNet
    is weight-bound at small batch). Norm scales upcast back inside the
    fp32 norm islands, so quality impact is negligible; training keeps fp32
    master weights."""
    return jax.tree.map(
        lambda p: p.astype(dtype) if p.dtype == jnp.float32 else p, params
    )


def build_default_model(
    dtype=jnp.bfloat16, testr_overrides=None, quantized=False,
    quant_static_amax=None, quant_min_ratio=None,
) -> TeReDiff:
    """Production TAIR geometry (SD-2.1 + SwinIR-TAIR).

    testr_overrides: optional dict of TESTRConfig field overrides (e.g.
    {"use_checkpoint": True, "enc_msda_q_chunk": 2048} for memory-bound
    training). quantized=True enables the w8a8 UNet+ControlNet serving
    path (ops/quant.py; inference-only approximation knob);
    quant_static_amax fixes the activation scale (static PTQ — removes the
    dynamic abs-max reduce); quant_min_ratio quantizes only
    weight-dominated sites (selective w8a8) — see ops/quant.py."""
    from .models.clip import CLIPTextConfig
    from .models.swinir import SwinIRConfig
    from .models.unet import UNetConfig
    from .models.vae import VAEConfig

    cldm = ControlLDM.create(
        unet_cfg=UNetConfig(),
        vae_cfg=VAEConfig(),
        clip_cfg=CLIPTextConfig(),
        dtype=dtype,
        quantized=quantized,
        quant_static_amax=quant_static_amax,
        quant_min_ratio=quant_min_ratio,
    )
    return TeReDiff.create(
        cldm=cldm,
        swinir=SwinIR(SwinIRConfig(), dtype=dtype),
        testr=TESTR(TESTRConfig(**(testr_overrides or {})), dtype=dtype),
    )


def build_dryrun_model(dtype=jnp.float32, enc_sp_axis=None) -> TeReDiff:
    """Minimal geometry for the driver's multi-chip dry run: same topology
    class (SwinIR -> VAE/CLIP -> ControlNet+UNet w/ feature taps -> TESTR)
    but only two UNet levels and two feature taps, so the dp x tp GSPMD
    compile stays well under the driver's time budget while still
    exercising every sharding pattern of the production step.

    enc_sp_axis: mesh axis for sequence-parallel token sharding of the
    spotter encoder (TESTRConfig.enc_sp_axis) so the dry run exercises the
    SP pattern alongside dp x tp."""
    from .models.clip import CLIPTextConfig
    from .models.swinir import SwinIRConfig
    from .models.unet import UNetConfig
    from .models.vae import VAEConfig

    unet_cfg = UNetConfig(
        model_channels=32, num_head_channels=16, context_dim=64,
        channel_mult=(1, 2), num_res_blocks=1, attention_resolutions=(2,),
    )
    cldm = ControlLDM.create(
        unet_cfg=unet_cfg,
        vae_cfg=VAEConfig(ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=1),
        clip_cfg=CLIPTextConfig(width=64, heads=4, layers=2),
        dtype=dtype,
    )
    swinir = SwinIR(
        SwinIRConfig(
            embed_dim=16, depths=(2,), num_heads=(2,), window_size=4, num_feat=8
        ),
        dtype=dtype,
    )
    testr = TESTR(
        TESTRConfig(
            d_model=32,
            n_heads=4,
            num_encoder_layers=1,
            num_decoder_layers=2,
            dim_feedforward=64,
            num_proposals=10,
            num_ctrl_points=16,
            num_chars=25,
            num_feature_levels=2,
            in_channels=(64, 32),
            enc_sp_axis=enc_sp_axis,
        ),
        dtype=dtype,
    )
    return TeReDiff.create(cldm=cldm, swinir=swinir, testr=testr)


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
    testr = TESTR(
        TESTRConfig(
            d_model=32,
            n_heads=4,
            num_encoder_layers=1,
            num_decoder_layers=2,
            dim_feedforward=64,
            num_proposals=10,
            num_ctrl_points=16,
            num_chars=25,
            in_channels=(128, 128, 64, 32),
        ),
        dtype=dtype,
    )
    return TeReDiff.create(cldm=cldm, swinir=swinir, testr=testr)
