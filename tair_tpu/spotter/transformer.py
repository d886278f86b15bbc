"""Deformable transformer for the TESTR text spotter (Flax, static shapes).

Capability parity with /root/reference/testr/adet/layers/deformable_transformer.py:
  - 6-layer encoder: MSDeformAttn self-attention over flattened multi-scale
    tokens (:186-254)
  - two-stage proposal generation gen_encoder_output_proposals (:85-115) and
    top-K selection (:159-166)
  - 6-layer composite decoder: location branch (intra/inter MHA + deformable
    cross-attn) and factorized text branch (:356-572)

TPU notes vs the reference: feature maps are never padded (TAIR always feeds
fixed 512^2-derived pyramids and passes all-False masks, models.py:122-127),
so valid-ratio bookkeeping collapses to 1 and is omitted; spatial shapes are
static Python tuples; intra/inter self-attention folds (instances x points)
into the batch so the MXU sees large uniform matmuls; dropout is omitted
(TAIR never trains the spotter with dropout active through the diffusion
features at inference, and training uses the same static graph).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.sharding import PartitionSpec as P

from .ms_deform_attn import MSDeformAttn

Dtype = Any


def inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


def _ln(name):
    return nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32, name=name)


def _dense(n, dtype, name):
    return nn.Dense(n, dtype=dtype, param_dtype=jnp.float32, name=name)


def _mha(heads, dtype, name):
    return nn.MultiHeadDotProductAttention(
        num_heads=heads, dtype=dtype, param_dtype=jnp.float32, name=name
    )


def encoder_reference_points(spatial_shapes) -> np.ndarray:
    """Static [S, L, 2] normalized reference grid (valid ratios == 1)."""
    pts = []
    for (h, w) in spatial_shapes:
        ref_y, ref_x = np.meshgrid(
            (np.arange(h, dtype=np.float32) + 0.5) / h,
            (np.arange(w, dtype=np.float32) + 0.5) / w,
            indexing="ij",
        )
        pts.append(np.stack([ref_x.reshape(-1), ref_y.reshape(-1)], -1))
    ref = np.concatenate(pts, 0)  # [S, 2]
    return np.tile(ref[:, None, :], (1, len(spatial_shapes), 1))


def proposal_grid(spatial_shapes) -> Tuple[np.ndarray, np.ndarray]:
    """Static per-token proposal boxes (cxcywh, unnormalized logit space) and
    their validity mask; wh = 0.05 * 2^level."""
    props = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        gy, gx = np.meshgrid(
            (np.arange(h, dtype=np.float32) + 0.5) / h,
            (np.arange(w, dtype=np.float32) + 0.5) / w,
            indexing="ij",
        )
        grid = np.stack([gx.reshape(-1), gy.reshape(-1)], -1)
        wh = np.full_like(grid, 0.05 * (2.0**lvl))
        props.append(np.concatenate([grid, wh], -1))
    props = np.concatenate(props, 0)  # [S, 4]
    valid = ((props > 0.01) & (props < 0.99)).all(-1)
    logit = np.log(props / (1 - props))
    logit[~valid] = np.inf
    return logit.astype(np.float32), valid


def sine_pos_embed_2d(h: int, w: int, num_pos_feats: int = 128) -> np.ndarray:
    """Static 2D sine embedding [h, w, 2*num_pos_feats] (normalize=True,
    scale=2pi), matching PositionalEncoding2D
    (/root/reference/testr/adet/layers/pos_encoding.py:46-83)."""
    scale = 2 * math.pi
    eps = 1e-6
    y = (np.arange(1, h + 1, dtype=np.float32) - 0.5) / (h + eps) * scale
    x = (np.arange(1, w + 1, dtype=np.float32) - 0.5) / (w + eps) * scale
    dim_t = np.arange(num_pos_feats, dtype=np.float32)
    dim_t = 10000.0 ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = x[None, :, None] / dim_t  # [1, w, F]
    pos_y = y[:, None, None] / dim_t  # [h, 1, F]
    pos_x = np.broadcast_to(pos_x, (h, w, num_pos_feats))
    pos_y = np.broadcast_to(pos_y, (h, w, num_pos_feats))

    def interleave(p):
        return np.stack([np.sin(p[..., 0::2]), np.cos(p[..., 1::2])], -1).reshape(
            h, w, -1
        )

    return np.concatenate([interleave(pos_y), interleave(pos_x)], -1)


def sine_pos_embed_1d(length: int, channels: int) -> np.ndarray:
    """Static 1D sine embedding [length, channels] (normalize=True, scale=2pi),
    matching PositionalEncoding1D (pos_encoding.py:5-43)."""
    scale = 2 * math.pi
    eps = 1e-6
    pos = np.arange(1, length + 1, dtype=np.float32)
    pos = pos / (pos[-1] + eps) * scale
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, channels, 2, np.float32) / channels))
    sin_inp = pos[:, None] * inv_freq[None]
    return np.concatenate([np.sin(sin_inp), np.cos(sin_inp)], -1).astype(np.float32)


def proposal_pos_embed(boxes: jnp.ndarray, d_model: int = 256) -> jnp.ndarray:
    """[B, K, 4] unactivated boxes -> [B, K, d_model] sine embedding
    (get_proposal_pos_embed, deformable_transformer.py:66-79)."""
    num_pos_feats = 64
    scale = 2 * math.pi
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = 10000.0 ** (2 * jnp.floor(dim_t / 2) / num_pos_feats)
    proposals = jax.nn.sigmoid(boxes) * scale
    pos = proposals[..., None] / dim_t  # [B, K, 4, 64]
    pos = jnp.stack([jnp.sin(pos[..., 0::2]), jnp.cos(pos[..., 1::2])], axis=-1)
    return pos.reshape(*boxes.shape[:-1], 4 * num_pos_feats)


class EncoderLayer(nn.Module):
    d_model: int
    d_ffn: int
    n_levels: int
    n_heads: int
    n_points: int
    dtype: Dtype = jnp.float32
    # large chunk = unchunked at inference shapes (Q=S~9.5k): measured 10.2ms
    # vs 13.9ms chunked on v5e. Training (autodiff residuals at batch>=2) can
    # lower this via TESTRConfig.enc_msda_q_chunk.
    msda_q_chunk: int = 16384
    # packed-index + MXU-reduce core: 3.74 vs 4.57 ms/layer device time at
    # encoder shapes (scripts/enc_trace.py A/B, v5e 2026-08-17)
    msda_core: str = "flatlanes"
    # sequence parallelism: mesh axis name to shard the TOKEN axis over.
    # The msda gather is row-RATE-bound (PERFORMANCE.md), so splitting the
    # QUERY axis across chips divides the per-chip row count by the axis
    # size — the right multi-chip axis for this layer, unlike TP head
    # sharding which only narrows each gathered row. Cost: GSPMD all-gathers
    # the value table once per layer (~4.6 MB bf16 at production S=9472,
    # negligible over ICI). None = single-chip semantics, no constraints.
    sp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes, sel_idx=None):
        """sel_idx=None: full update (exact reference semantics).

        sel_idx [B, N]: sparse update — only the selected tokens are used as
        msda queries and run through the FFN; every other token passes
        through unchanged (it still serves as a gather source via `src`).
        The msda gather row count scales with the query count, so this cuts
        the encoder's dominant cost by S/N (Sparse-DETR-style serving knob;
        see DeformableTransformer.enc_topk).
        """
        attn = MSDeformAttn(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            dtype=self.dtype, core=self.msda_core, q_chunk=self.msda_q_chunk,
            name="self_attn",
        )
        norm1, norm2 = _ln("norm1"), _ln("norm2")
        lin1 = _dense(self.d_ffn, self.dtype, "linear1")
        lin2 = _dense(self.d_model, self.dtype, "linear2")

        if self.sp_axis:
            # shard the token axis of [B, S, C]; batch/channel stay
            # UNCONSTRAINED so dp batch sharding (training) or tp feature
            # sharding pass through untouched
            def tok_sharded(x):
                return jax.lax.with_sharding_constraint(
                    x, P(P.UNCONSTRAINED, self.sp_axis, P.UNCONSTRAINED)
                )
        else:
            def tok_sharded(x):
                return x

        if sel_idx is None:
            q = tok_sharded(src + pos)
            src2 = tok_sharded(attn(q, reference_points, src, spatial_shapes))
            src = tok_sharded(norm1(src + src2).astype(self.dtype))
            h = nn.relu(lin1(src))
            h = lin2(h)
            return tok_sharded(norm2(src + h).astype(self.dtype))

        b, n = sel_idx.shape
        # sel_idx comes from top_k: in-bounds, so mode="clip" skips the
        # fill-mode select pass over the gathered tensors
        src_sel = jnp.take_along_axis(src, sel_idx[..., None], axis=1, mode="clip")
        pos_sel = jnp.take_along_axis(
            jnp.broadcast_to(pos, src.shape), sel_idx[..., None], axis=1,
            mode="clip",
        )
        ref_idx = jnp.broadcast_to(
            sel_idx[:, :, None, None],
            (b, n) + reference_points.shape[2:],
        )
        ref_sel = jnp.take_along_axis(reference_points, ref_idx, axis=1, mode="clip")
        src2 = tok_sharded(attn(src_sel + pos_sel, ref_sel, src, spatial_shapes))
        upd = tok_sharded(norm1(src_sel + src2).astype(self.dtype))
        h = nn.relu(lin1(upd))
        h = lin2(h)
        upd = tok_sharded(norm2(upd + h).astype(self.dtype))
        return tok_sharded(src.at[jnp.arange(b)[:, None], sel_idx].set(upd))


class CompositeDecoderLayer(nn.Module):
    """Location branch + factorized text branch (one decoder layer)."""

    d_model: int
    d_ffn: int
    n_levels: int
    n_heads: int
    n_points: int
    dtype: Dtype = jnp.float32
    # flatpatch-mxu wins at decoder cross-attn shapes too (Q=1600/2500:
    # 1.9/1.8ms vs flat 2.1/7.2ms on v5e); unchunked at these sizes
    msda_q_chunk: int = 16384
    msda_core: str = "flatlanes"

    @nn.compact
    def __call__(
        self,
        tgt,        # [B, K, Np, C] ctrl-point queries
        query_pos,  # [B, K, Np, C]
        tgt_text,   # [B, K, Nw, C] text queries
        query_pos_text,  # [K, Nw, C] or [B, K, Nw, C]
        reference_points,  # [B, K, L, 4]
        src,        # [B, S, C]
        spatial_shapes,
    ):
        b, k, n_pts, c = tgt.shape
        n_words = tgt_text.shape[2]

        def fold(x):  # [B, K, N, C] -> [B*K, N, C]
            return x.reshape(b * k, x.shape[2], c)

        def swap_fold(x):  # [B, K, N, C] -> [B*N, K, C]
            return x.transpose(0, 2, 1, 3).reshape(b * x.shape[2], k, c)

        # --- location branch ---
        q = tgt + query_pos
        a = _mha(self.n_heads, self.dtype, "attn_intra")(fold(q), fold(q), fold(tgt))
        tgt = _ln("norm_intra")(tgt + a.reshape(tgt.shape)).astype(self.dtype)

        q = swap_fold(tgt)
        a = _mha(self.n_heads, self.dtype, "attn_inter")(q, q, q)
        a = a.reshape(b, n_pts, k, c).transpose(0, 2, 1, 3)
        tgt = _ln("norm_inter")(tgt + a).astype(self.dtype)

        ref = jnp.tile(reference_points[:, :, None], (1, 1, n_pts, 1, 1))
        a = MSDeformAttn(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            dtype=self.dtype, core=self.msda_core, q_chunk=self.msda_q_chunk,
            name="attn_cross",
        )(
            (tgt + query_pos).reshape(b, k * n_pts, c),
            ref.reshape(b, k * n_pts, self.n_levels, reference_points.shape[-1]),
            src,
            spatial_shapes,
        )
        tgt = _ln("norm_cross")(tgt + a.reshape(tgt.shape)).astype(self.dtype)

        h = nn.relu(_dense(self.d_ffn, self.dtype, "linear1")(tgt))
        h = _dense(self.d_model, self.dtype, "linear2")(h)
        tgt = _ln("norm3")(tgt + h).astype(self.dtype)

        # --- text branch (factorized) ---
        qp_text = jnp.broadcast_to(
            query_pos_text if query_pos_text.ndim == 4 else query_pos_text[None],
            tgt_text.shape,
        )
        q = tgt_text + qp_text
        a = _mha(self.n_heads, self.dtype, "attn_intra_text")(
            fold(q), fold(q), fold(tgt_text)
        )
        tgt_text = _ln("norm_intra_text")(tgt_text + a.reshape(tgt_text.shape)).astype(
            self.dtype
        )

        q = swap_fold(tgt_text)
        a = _mha(self.n_heads, self.dtype, "attn_inter_text")(q, q, q)
        a = a.reshape(b, n_words, k, c).transpose(0, 2, 1, 3)
        tgt_text = _ln("norm_inter_text")(tgt_text + a).astype(self.dtype)

        ref_t = jnp.tile(reference_points[:, :, None], (1, 1, n_words, 1, 1))
        a = MSDeformAttn(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            dtype=self.dtype, core=self.msda_core, q_chunk=self.msda_q_chunk,
            name="attn_cross_text",
        )(
            (tgt_text + qp_text).reshape(b, k * n_words, c),
            ref_t.reshape(b, k * n_words, self.n_levels, reference_points.shape[-1]),
            src,
            spatial_shapes,
        )
        tgt_text = _ln("norm_cross_text")(tgt_text + a.reshape(tgt_text.shape)).astype(
            self.dtype
        )

        h = nn.relu(_dense(self.d_ffn, self.dtype, "linear1_text")(tgt_text))
        h = _dense(self.d_model, self.dtype, "linear2_text")(h)
        tgt_text = _ln("norm3_text")(tgt_text + h).astype(self.dtype)

        return tgt, tgt_text


class DeformableTransformer(nn.Module):
    """Full two-stage pipeline: encoder -> proposals -> composite decoder.

    __call__(srcs, pos_embeds, ctrl_point_embed, text_embed, text_pos_embed)
    returns (hs [Ld,B,K,Np,C], hs_text [Ld,B,K,Nw,C], init_reference [B,K,4],
             enc_class [B,S,1], enc_coord_unact [B,S,4]).
    """

    d_model: int = 256
    n_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    d_ffn: int = 1024
    n_levels: int = 4
    enc_n_points: int = 4
    dec_n_points: int = 4
    num_proposals: int = 100
    enc_msda_q_chunk: int = 16384
    # Sparse encoder update (serving knob, default off = exact semantics):
    # when >0, only the enc_topk highest-salience tokens (scored by the
    # model's own two-stage objectness head applied to the encoder INPUT)
    # are updated per encoder layer; the rest pass through but remain gather
    # sources. Gather rows — the measured wall at ~45% of the restore loop —
    # scale with the query count, so cost drops ~S/N. Quality impact needs
    # trained weights to quantify; keep 0 for reference-parity runs.
    enc_topk: int = 0
    # sequence parallelism for the encoder: mesh axis name to shard the
    # token axis over (see EncoderLayer.sp_axis). The encoder is the restore
    # loop's measured bottleneck and its gather cost is row-rate-bound, so
    # this is the axis that actually divides per-chip work under a multi-chip
    # serving mesh. None = no constraints (single-chip semantics).
    enc_sp_axis: Optional[str] = None
    # gradient checkpointing per encoder/decoder layer (training memory: the
    # msda gather intermediates are the big residuals; remat recomputes them)
    use_checkpoint: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, srcs, pos_embeds, ctrl_point_embed, text_embed, text_pos_embed):
        spatial_shapes = tuple((s.shape[1], s.shape[2]) for s in srcs)
        b = srcs[0].shape[0]
        c = self.d_model

        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (self.n_levels, c), jnp.float32
        )

        src_flat = jnp.concatenate(
            [s.reshape(b, -1, c) for s in srcs], axis=1
        )  # [B, S, C]
        pos_flat = jnp.concatenate(
            [
                (p.reshape(-1, c)[None] + level_embed[lvl][None, None]).astype(
                    src_flat.dtype
                )
                for lvl, p in enumerate(pos_embeds)
            ],
            axis=1,
        )
        pos_flat = jnp.broadcast_to(pos_flat, src_flat.shape)

        # two-stage head modules, hoisted so the sparse-encoder salience
        # scorer can share their parameters (called once for selection on the
        # encoder input, once on the final memory — same instances)
        prop_logit, prop_valid = proposal_grid(spatial_shapes)
        enc_output = _dense(c, self.dtype, "enc_output")
        enc_output_norm = _ln("enc_output_norm")
        bbox_class = _dense(1, self.dtype, "bbox_class_embed")
        bbox_embed = MLPHead(c, 4, 3, dtype=self.dtype, name="bbox_embed")

        # encoder
        ref = jnp.asarray(encoder_reference_points(spatial_shapes))[None]
        ref = jnp.broadcast_to(ref, (b,) + ref.shape[1:])
        memory = src_flat

        sel_idx = None
        if self.enc_topk and self.enc_topk < src_flat.shape[1]:
            sal = bbox_class(
                enc_output_norm(enc_output(src_flat)).astype(self.dtype)
            )[..., 0]
            sal = jnp.where(jnp.asarray(prop_valid)[None], sal, -jnp.inf)
            _, sel_idx = jax.lax.top_k(sal, self.enc_topk)  # [B, N]
            sel_idx = jnp.sort(sel_idx, axis=1)  # ascending: friendlier gathers

        # spatial_shapes is a static Python tuple -> static_argnums under remat
        enc_cls = (
            nn.remat(EncoderLayer, static_argnums=(4,))
            if self.use_checkpoint
            else EncoderLayer
        )
        dec_cls = (
            nn.remat(CompositeDecoderLayer, static_argnums=(7,))
            if self.use_checkpoint
            else CompositeDecoderLayer
        )
        for i in range(self.num_encoder_layers):
            memory = enc_cls(
                c, self.d_ffn, self.n_levels, self.n_heads, self.enc_n_points,
                dtype=self.dtype, msda_q_chunk=self.enc_msda_q_chunk,
                sp_axis=self.enc_sp_axis,
                name=f"enc_{i}",
            )(memory, pos_flat, ref, spatial_shapes, sel_idx)

        # two-stage proposals
        output_memory = jnp.where(
            jnp.asarray(prop_valid)[None, :, None], memory, 0.0
        )
        output_memory = enc_output_norm(enc_output(output_memory)).astype(
            self.dtype
        )

        enc_class = bbox_class(output_memory)  # [B, S, 1]
        bbox_delta = bbox_embed(output_memory)
        enc_coord_unact = bbox_delta + jnp.asarray(prop_logit)[None]  # [B, S, 4]

        k = self.num_proposals
        # mask invalid proposals out of the top-k by score
        scores = jnp.where(
            jnp.asarray(prop_valid)[None], enc_class[..., 0], -jnp.inf
        )
        _, topk_idx = jax.lax.top_k(scores, k)  # [B, K]
        topk_coords_unact = jnp.take_along_axis(
            enc_coord_unact, topk_idx[..., None], axis=1, mode="clip"
        )
        topk_coords_unact = jax.lax.stop_gradient(topk_coords_unact)
        reference_points = jax.nn.sigmoid(topk_coords_unact)  # [B, K, 4]

        query_pos = _ln("pos_trans_norm")(
            _dense(c, self.dtype, "pos_trans")(
                proposal_pos_embed(topk_coords_unact, c)
            )
        ).astype(self.dtype)

        # decoder queries
        n_pts = ctrl_point_embed.shape[0]
        n_words = text_embed.shape[0]
        tgt = jnp.broadcast_to(ctrl_point_embed[None, None], (b, k, n_pts, c)).astype(
            self.dtype
        )
        qp = jnp.broadcast_to(query_pos[:, :, None], (b, k, n_pts, c))
        tgt_text = jnp.broadcast_to(text_embed[None, None], (b, k, n_words, c)).astype(
            self.dtype
        )

        ref_input = reference_points[:, :, None, :]  # [B, K, 1, 4]
        ref_input = jnp.broadcast_to(ref_input, (b, k, self.n_levels, 4))

        hs, hs_text = [], []
        for i in range(self.num_decoder_layers):
            tgt, tgt_text = dec_cls(
                c, self.d_ffn, self.n_levels, self.n_heads, self.dec_n_points,
                dtype=self.dtype, name=f"dec_{i}",
            )(tgt, qp, tgt_text, text_pos_embed, ref_input, memory, spatial_shapes)
            hs.append(tgt)
            hs_text.append(tgt_text)

        return (
            jnp.stack(hs),
            jnp.stack(hs_text),
            reference_points,
            enc_class,
            enc_coord_unact,
        )


class MLPHead(nn.Module):
    """num_layers-deep ReLU MLP (the reference's MLP, models.py:12-25)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    zero_init_last: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(_dense(self.hidden_dim, self.dtype, f"fc{i}")(x))
        last = nn.Dense(
            self.output_dim,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.zeros
            if self.zero_init_last
            else nn.initializers.lecun_normal(),
            name=f"fc{self.num_layers - 1}",
        )
        return last(x)
