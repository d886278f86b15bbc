"""TESTR text spotter consuming diffusion UNet decoder features.

Capability parity with /root/reference/testr/adet/modeling/testr/models.py:27-179
and transformer_detector.py:11-152: per-level diff_feat_proj (1x1 conv -> GN
-> GELU -> 3x3 conv -> GN -> GELU) from UNet channels to d_model, 2D sine
positional encodings, two-stage deformable transformer, shared per-layer
heads (ctrl-point class/coord, text class), focal-style bias init, and the
score-threshold inference decode.

Static-shape inference: instead of the reference's ragged per-image Instances
(boolean indexing, transformer_detector.py:123-152), inference returns dense
[B, K, ...] tensors plus a keep-mask — identical information, jit-friendly;
host-side text decode happens in postprocess.decode_recs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .transformer import (
    DeformableTransformer,
    MLPHead,
    inverse_sigmoid,
    sine_pos_embed_1d,
    sine_pos_embed_2d,
)

Dtype = Any


@dataclass(frozen=True)
class TESTRConfig:
    d_model: int = 256
    n_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 1024
    num_feature_levels: int = 4
    enc_n_points: int = 4
    dec_n_points: int = 4
    num_proposals: int = 100          # NUM_QUERIES
    num_ctrl_points: int = 16         # polygon control points
    num_chars: int = 25               # max text length
    voc_size: int = 96                # char vocabulary (plus 1 for EOS/blank)
    in_channels: Tuple[int, ...] = (1280, 1280, 640, 320)
    test_score_threshold: float = 0.5  # val.py:133 overrides 0.45 -> 0.5
    # encoder msda query chunk; 16384 = unchunked at inference shapes,
    # lower it for large-batch training to bound autodiff residuals
    enc_msda_q_chunk: int = 16384
    # sparse encoder update (0 = full/exact): update only the top-N salient
    # tokens per encoder layer; serving knob like spotter_every — see
    # DeformableTransformer.enc_topk and docs/PERFORMANCE.md
    enc_topk: int = 0
    # sequence-parallel encoder: mesh axis name to shard the token axis over
    # under a multi-chip serving mesh (EncoderLayer.sp_axis rationale);
    # None = no sharding constraints
    enc_sp_axis: Optional[str] = None
    # remat encoder/decoder layers (training: recompute msda gathers instead
    # of keeping them as autodiff residuals; mirrors UNetConfig.use_checkpoint)
    use_checkpoint: bool = False


class DiffFeatProj(nn.Module):
    """Per-level projection from UNet feature channels to d_model (NHWC)."""

    d_model: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.d_model, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=nn.initializers.xavier_uniform(), name="conv1",
        )(x)
        x = nn.GroupNorm(32, dtype=jnp.float32, param_dtype=jnp.float32, name="gn1")(
            x.astype(jnp.float32)
        ).astype(self.dtype)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(
            self.d_model, (3, 3), padding=1, dtype=self.dtype,
            param_dtype=jnp.float32, name="conv2",
        )(x)
        x = nn.GroupNorm(32, dtype=jnp.float32, param_dtype=jnp.float32, name="gn2")(
            x.astype(jnp.float32)
        ).astype(self.dtype)
        return nn.gelu(x, approximate=False)


class TESTR(nn.Module):
    cfg: TESTRConfig = TESTRConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> Dict[str, Any]:
        """feats: tuple of NHWC UNet decoder features (channels cfg.in_channels).

        Returns dict:
          pred_logits      [B, K, Np, 1]
          pred_ctrl_points [B, K, Np, 2]
          pred_texts       [B, K, Nw, voc+1]
          aux_outputs      list of the same for decoder layers 0..L-2
          enc_outputs      {pred_logits [B,S,1], pred_boxes [B,S,4]}
        """
        cfg = self.cfg
        c = cfg.d_model

        srcs = [
            DiffFeatProj(c, self.dtype, name=f"diff_feat_proj_{i}")(f)
            for i, f in enumerate(feats)
        ]
        pos = [
            jnp.asarray(sine_pos_embed_2d(s.shape[1], s.shape[2], c // 2))
            for s in srcs
        ]

        ctrl_point_embed = self.param(
            "ctrl_point_embed", nn.initializers.normal(1.0),
            (cfg.num_ctrl_points, c), jnp.float32,
        )
        text_embed = self.param(
            "text_embed", nn.initializers.normal(1.0), (cfg.num_chars, c),
            jnp.float32,
        )
        text_pos_embed = jnp.asarray(sine_pos_embed_1d(cfg.num_chars, c))

        hs, hs_text, init_reference, enc_class, enc_coord_unact = (
            DeformableTransformer(
                d_model=c,
                n_heads=cfg.n_heads,
                num_encoder_layers=cfg.num_encoder_layers,
                num_decoder_layers=cfg.num_decoder_layers,
                d_ffn=cfg.dim_feedforward,
                n_levels=cfg.num_feature_levels,
                enc_n_points=cfg.enc_n_points,
                dec_n_points=cfg.dec_n_points,
                num_proposals=cfg.num_proposals,
                enc_msda_q_chunk=cfg.enc_msda_q_chunk,
                enc_topk=cfg.enc_topk,
                enc_sp_axis=cfg.enc_sp_axis,
                use_checkpoint=cfg.use_checkpoint,
                dtype=self.dtype,
                name="transformer",
            )(srcs, pos, ctrl_point_embed, text_embed, text_pos_embed)
        )

        # shared heads across decoder layers (the reference repeats the SAME
        # module instance per layer, models.py:104-108)
        focal_bias = float(-np.log((1 - 0.01) / 0.01))
        ctrl_class = nn.Dense(
            1, dtype=self.dtype, param_dtype=jnp.float32,
            bias_init=nn.initializers.constant(focal_bias), name="ctrl_point_class",
        )
        ctrl_coord = MLPHead(c, 2, 3, zero_init_last=True, dtype=self.dtype,
                             name="ctrl_point_coord")
        text_class = nn.Dense(
            cfg.voc_size + 1, dtype=self.dtype, param_dtype=jnp.float32,
            name="text_class",
        )

        ref_logit = inverse_sigmoid(init_reference)  # [B, K, 4]
        # heads applied ONCE over the stacked [L, B, K, N, C] decoder states
        # (Dense acts on the trailing dim; [B,K,1,2] broadcasts under the
        # leading L) — 3 matmuls instead of 3 x num_decoder_layers small
        # dispatches; bit-identical to the per-layer loop
        logits_all = ctrl_class(hs)                       # [L, B, K, Np, 1]
        coords_all = jax.nn.sigmoid(
            ctrl_coord(hs) + ref_logit[:, :, None, :2]
        )                                                 # [L, B, K, Np, 2]
        texts_all = text_class(hs_text)                   # [L, B, K, Nw, V+1]
        layer_outs = [
            {
                "pred_logits": logits_all[lvl],
                "pred_ctrl_points": coords_all[lvl],
                "pred_texts": texts_all[lvl],
            }
            for lvl in range(cfg.num_decoder_layers)
        ]

        out = dict(layer_outs[-1])
        out["aux_outputs"] = layer_outs[:-1]
        out["enc_outputs"] = {
            "pred_logits": enc_class,
            "pred_boxes": jax.nn.sigmoid(enc_coord_unact),
        }
        return out


def spotter_inference(
    output: Dict[str, Any], score_threshold: float = 0.5, image_size: int = 512
):
    """Dense, jit-friendly decode of the spotter output.

    Mirrors TransformerDetector.inference (transformer_detector.py:123-152)
    but returns fixed-shape tensors:
      scores  [B, K]       sigmoid of mean point logit
      keep    [B, K] bool  scores >= threshold
      polygons[B, K, Np, 2] pixel coords
      recs    [B, K, Nw]   argmax char ids
      rec_scores [B, K, Nw, voc+1] softmax char distribution
    """
    logits = output["pred_logits"]           # [B, K, Np, 1]
    coords = output["pred_ctrl_points"]      # [B, K, Np, 2]
    texts = output["pred_texts"]             # [B, K, Nw, V+1]

    prob = jax.nn.sigmoid(jnp.mean(logits.astype(jnp.float32), axis=-2))  # [B,K,1]
    scores = jnp.max(prob, axis=-1)
    keep = scores >= score_threshold
    polygons = coords.astype(jnp.float32) * image_size
    rec_scores = jax.nn.softmax(texts.astype(jnp.float32), axis=-1)
    recs = jnp.argmax(rec_scores, axis=-1)
    return {
        "scores": scores,
        "keep": keep,
        "polygons": polygons,
        "recs": recs,
        "rec_scores": rec_scores,
    }
