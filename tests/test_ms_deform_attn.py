"""Parity test of the XLA ms-deform-attn core against a torch grid_sample
oracle — the same oracle relationship the reference uses to validate its CUDA
kernel (ms_deform_attn_core_pytorch, "for debug and test only")."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from tair_tpu.spotter.ms_deform_attn import MSDeformAttn, ms_deform_attn_core


def torch_oracle(value, spatial_shapes, sampling_locations, attention_weights):
    """Pure-torch multi-scale deformable attention via grid_sample."""
    b, _, h, d = value.shape
    _, q, _, n_levels, n_points, _ = sampling_locations.shape
    splits = [hl * wl for hl, wl in spatial_shapes]
    value_list = value.split(splits, dim=1)
    out = torch.zeros(b, q, h, d)
    for lvl, (hl, wl) in enumerate(spatial_shapes):
        v = value_list[lvl].permute(0, 2, 3, 1).reshape(b * h, d, hl, wl)
        grid = 2 * sampling_locations[:, :, :, lvl] - 1  # [B,Q,H,P,2]
        grid = grid.permute(0, 2, 1, 3, 4).reshape(b * h, q, n_points, 2)
        sampled = F.grid_sample(
            v, grid, mode="bilinear", padding_mode="zeros", align_corners=False
        )  # [B*H, D, Q, P]
        w = attention_weights[:, :, :, lvl].permute(0, 2, 1, 3)  # [B,H,Q,P]
        w = w.reshape(b * h, 1, q, n_points)
        out += (sampled * w).sum(-1).reshape(b, h, d, q).permute(0, 3, 1, 2)
    return out.reshape(b, q, h * d)


def test_core_matches_torch_grid_sample():
    rs = np.random.RandomState(0)
    b, h, d, q, p = 2, 4, 8, 10, 4
    shapes = ((6, 8), (3, 4), (2, 2))
    s = sum(hh * ww for hh, ww in shapes)
    value = rs.randn(b, s, h, d).astype(np.float32)
    # locations straddle in-bounds and out-of-bounds regions
    locs = rs.uniform(-0.2, 1.2, (b, q, h, len(shapes), p, 2)).astype(np.float32)
    attn = rs.rand(b, q, h, len(shapes), p).astype(np.float32)
    attn /= attn.sum((-1, -2), keepdims=True)

    ours = np.asarray(
        ms_deform_attn_core(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(attn)
        )
    )
    ref = torch_oracle(
        torch.from_numpy(value),
        shapes,
        torch.from_numpy(locs),
        torch.from_numpy(attn),
    ).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_core_gradients_flow():
    shapes = ((4, 4), (2, 2))
    s = sum(hh * ww for hh, ww in shapes)
    value = jnp.asarray(np.random.RandomState(1).randn(1, s, 2, 4), jnp.float32)
    locs = jnp.full((1, 3, 2, 2, 2, 2), 0.5)
    attn = jnp.full((1, 3, 2, 2, 2), 0.25)

    def f(v, l, a):
        return ms_deform_attn_core(v, shapes, l, a).sum()

    gv, gl, ga = jax.grad(f, argnums=(0, 1, 2))(value, locs, attn)
    assert np.isfinite(np.asarray(gv)).all()
    assert np.abs(np.asarray(gl)).sum() > 0  # bilinear gradient wrt locations
    assert np.abs(np.asarray(ga)).sum() > 0


def test_module_shapes_and_init():
    m = MSDeformAttn(d_model=32, n_levels=2, n_heads=4, n_points=4)
    shapes = ((4, 4), (2, 2))
    s = sum(hh * ww for hh, ww in shapes)
    q = jnp.ones((1, 5, 32))
    ref = jnp.full((1, 5, 2, 2), 0.5)
    v = jnp.ones((1, s, 32))
    params = m.init(jax.random.PRNGKey(0), q, ref, v, shapes)
    out = m.apply(params, q, ref, v, shapes)
    assert out.shape == (1, 5, 32)
    # zero-init kernels: offsets come only from the directional bias
    k = params["params"]["sampling_offsets"]["kernel"]
    assert np.asarray(jnp.abs(k)).sum() == 0.0
    bias = np.asarray(params["params"]["sampling_offsets"]["bias"]).reshape(4, 2, 4, 2)
    # radii grow with point index
    r = np.abs(bias).max(-1)
    assert (r[:, :, 1] > r[:, :, 0]).all()


def test_module_with_box_references():
    m = MSDeformAttn(d_model=16, n_levels=2, n_heads=2, n_points=2)
    shapes = ((4, 4), (2, 2))
    s = sum(hh * ww for hh, ww in shapes)
    q = jnp.ones((1, 3, 16))
    ref = jnp.tile(jnp.asarray([0.5, 0.5, 0.2, 0.3]), (1, 3, 2, 1))
    v = jnp.ones((1, s, 16))
    params = m.init(jax.random.PRNGKey(0), q, ref, v, shapes)
    out = m.apply(params, q, ref, v, shapes)
    assert out.shape == (1, 3, 16)


def test_patch_variant_matches_core():
    from tair_tpu.spotter.ms_deform_attn import ms_deform_attn_core_patch

    rs = np.random.RandomState(5)
    b, h, d, q, p = 2, 4, 8, 12, 4
    shapes = ((6, 8), (3, 4), (2, 2))
    s = sum(hh * ww for hh, ww in shapes)
    value = rs.randn(b, s, h, d).astype(np.float32)
    locs = rs.uniform(-0.2, 1.2, (b, q, h, len(shapes), p, 2)).astype(np.float32)
    attn = rs.rand(b, q, h, len(shapes), p).astype(np.float32)
    attn /= attn.sum((-1, -2), keepdims=True)

    ref = np.asarray(
        ms_deform_attn_core(jnp.asarray(value), shapes, jnp.asarray(locs),
                            jnp.asarray(attn))
    )
    out = np.asarray(
        ms_deform_attn_core_patch(jnp.asarray(value), shapes, jnp.asarray(locs),
                                  jnp.asarray(attn))
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_flat_variant_matches_core():
    from tair_tpu.spotter.ms_deform_attn import ms_deform_attn_core_flat

    rs = np.random.RandomState(7)
    b, h, d, q, p = 2, 4, 8, 12, 4
    shapes = ((6, 8), (3, 4), (2, 2))
    s = sum(hh * ww for hh, ww in shapes)
    value = rs.randn(b, s, h, d).astype(np.float32)
    locs = rs.uniform(-0.2, 1.2, (b, q, h, len(shapes), p, 2)).astype(np.float32)
    attn = rs.rand(b, q, h, len(shapes), p).astype(np.float32)
    attn /= attn.sum((-1, -2), keepdims=True)

    ref = np.asarray(
        ms_deform_attn_core(jnp.asarray(value), shapes, jnp.asarray(locs),
                            jnp.asarray(attn))
    )
    out = np.asarray(
        ms_deform_attn_core_flat(jnp.asarray(value), shapes, jnp.asarray(locs),
                                 jnp.asarray(attn))
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_flat_variant_chunked_matches():
    from tair_tpu.spotter.ms_deform_attn import ms_deform_attn_core_flat

    rs = np.random.RandomState(9)
    b, h, d, q, p = 1, 2, 4, 37, 2  # q not divisible by chunk
    shapes = ((4, 4), (3, 3))
    s = sum(hh * ww for hh, ww in shapes)
    value = rs.randn(b, s, h, d).astype(np.float32)
    locs = rs.uniform(0, 1, (b, q, h, len(shapes), p, 2)).astype(np.float32)
    attn = rs.rand(b, q, h, len(shapes), p).astype(np.float32)

    full = np.asarray(
        ms_deform_attn_core_flat(jnp.asarray(value), shapes, jnp.asarray(locs),
                                 jnp.asarray(attn), q_chunk=4096)
    )
    chunked = np.asarray(
        ms_deform_attn_core_flat(jnp.asarray(value), shapes, jnp.asarray(locs),
                                 jnp.asarray(attn), q_chunk=8)
    )
    np.testing.assert_allclose(chunked, full, atol=1e-5)


def test_flat_chunked_gradients():
    from tair_tpu.spotter.ms_deform_attn import ms_deform_attn_core_flat

    shapes = ((4, 4), (2, 2))
    s = sum(hh * ww for hh, ww in shapes)
    value = jnp.asarray(np.random.RandomState(1).randn(1, s, 2, 4), jnp.float32)
    locs = jnp.full((1, 30, 2, 2, 2, 2), 0.5)
    attn = jnp.full((1, 30, 2, 2, 2), 0.25)

    def f(v, l, a, chunk):
        return ms_deform_attn_core_flat(v, shapes, l, a, q_chunk=chunk).sum()

    g_full = jax.grad(f, argnums=(0, 1, 2))(value, locs, attn, 4096)
    g_chunk = jax.grad(f, argnums=(0, 1, 2))(value, locs, attn, 8)
    for a, b in zip(g_full, g_chunk):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    assert np.abs(np.asarray(g_full[0])).sum() > 0


def test_flatpatch_variant_matches_core():
    from tair_tpu.spotter.ms_deform_attn import ms_deform_attn_core_flatpatch

    rs = np.random.RandomState(11)
    b, h, d, q, p = 2, 4, 8, 12, 4
    shapes = ((6, 8), (3, 4), (2, 2))
    s = sum(hh * ww for hh, ww in shapes)
    value = rs.randn(b, s, h, d).astype(np.float32)
    locs = rs.uniform(-0.2, 1.2, (b, q, h, len(shapes), p, 2)).astype(np.float32)
    attn = rs.rand(b, q, h, len(shapes), p).astype(np.float32)
    attn /= attn.sum((-1, -2), keepdims=True)

    ref = np.asarray(
        ms_deform_attn_core(jnp.asarray(value), shapes, jnp.asarray(locs),
                            jnp.asarray(attn))
    )
    out = np.asarray(
        ms_deform_attn_core_flatpatch(jnp.asarray(value), shapes,
                                      jnp.asarray(locs), jnp.asarray(attn))
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_flatpatch_chunked_and_grads():
    from tair_tpu.spotter.ms_deform_attn import ms_deform_attn_core_flatpatch

    rs = np.random.RandomState(13)
    b, h, d, q, p = 1, 2, 4, 37, 2
    shapes = ((4, 4), (3, 3))
    s = sum(hh * ww for hh, ww in shapes)
    value = jnp.asarray(rs.randn(b, s, h, d), jnp.float32)
    locs = jnp.asarray(rs.uniform(-0.1, 1.1, (b, q, h, 2, p, 2)), jnp.float32)
    attn = jnp.asarray(rs.rand(b, q, h, 2, p), jnp.float32)

    full = np.asarray(
        ms_deform_attn_core_flatpatch(value, shapes, locs, attn, q_chunk=4096)
    )
    chunked = np.asarray(
        ms_deform_attn_core_flatpatch(value, shapes, locs, attn, q_chunk=8)
    )
    np.testing.assert_allclose(chunked, full, atol=1e-5)

    def f(v, l, a, chunk):
        return ms_deform_attn_core_flatpatch(v, shapes, l, a, q_chunk=chunk).sum()

    g_full = jax.grad(f, argnums=(0, 1, 2))(value, locs, attn, 4096)
    g_chunk = jax.grad(f, argnums=(0, 1, 2))(value, locs, attn, 8)
    for ga, gb in zip(g_full, g_chunk):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-5)
    assert np.abs(np.asarray(g_full[0])).sum() > 0


def _pack_lanes(locs, attn):
    """[B,Q,H,L,P,2]+[B,Q,H,L,P] -> packed (locx, locy, attn) [B,Q,H*L*P]."""
    b, q, h, L, p, _ = locs.shape
    lanes = h * L * p
    return (
        locs[..., 0].reshape(b, q, lanes),
        locs[..., 1].reshape(b, q, lanes),
        attn.reshape(b, q, lanes),
    )


def test_flatlanes_variant_matches_core():
    from tair_tpu.spotter.ms_deform_attn import ms_deform_attn_core_flatlanes

    rs = np.random.RandomState(17)
    b, h, d, q, p = 2, 4, 8, 12, 4
    shapes = ((6, 8), (3, 4), (2, 2))
    s = sum(hh * ww for hh, ww in shapes)
    value = rs.randn(b, s, h, d).astype(np.float32)
    locs = rs.uniform(-0.2, 1.2, (b, q, h, len(shapes), p, 2)).astype(np.float32)
    attn = rs.rand(b, q, h, len(shapes), p).astype(np.float32)
    attn /= attn.sum((-1, -2), keepdims=True)

    ref = np.asarray(
        ms_deform_attn_core(jnp.asarray(value), shapes, jnp.asarray(locs),
                            jnp.asarray(attn))
    )
    lx, ly, aw = _pack_lanes(jnp.asarray(locs), jnp.asarray(attn))
    for reduce in ("fused", "mxu", "mask"):
        out = np.asarray(
            ms_deform_attn_core_flatlanes(
                jnp.asarray(value), shapes, lx, ly, aw, reduce=reduce
            )
        )
        np.testing.assert_allclose(out, ref, atol=1e-5, err_msg=reduce)


def test_flatlanes_chunked_and_grads():
    from tair_tpu.spotter.ms_deform_attn import ms_deform_attn_core_flatlanes

    rs = np.random.RandomState(19)
    b, h, d, q, p = 1, 2, 4, 37, 2
    shapes = ((4, 4), (3, 3))
    s = sum(hh * ww for hh, ww in shapes)
    value = jnp.asarray(rs.randn(b, s, h, d), jnp.float32)
    locs = jnp.asarray(rs.uniform(-0.1, 1.1, (b, q, h, 2, p, 2)), jnp.float32)
    attn = jnp.asarray(rs.rand(b, q, h, 2, p), jnp.float32)
    lx, ly, aw = _pack_lanes(locs, attn)

    full = np.asarray(
        ms_deform_attn_core_flatlanes(value, shapes, lx, ly, aw, q_chunk=4096)
    )
    chunked = np.asarray(
        ms_deform_attn_core_flatlanes(value, shapes, lx, ly, aw, q_chunk=8)
    )
    np.testing.assert_allclose(chunked, full, atol=1e-5)

    def f(v, lx_, ly_, a, chunk):
        return ms_deform_attn_core_flatlanes(
            v, shapes, lx_, ly_, a, q_chunk=chunk
        ).sum()

    g_full = jax.grad(f, argnums=(0, 1, 2, 3))(value, lx, ly, aw, 4096)
    g_chunk = jax.grad(f, argnums=(0, 1, 2, 3))(value, lx, ly, aw, 8)
    for ga, gb in zip(g_full, g_chunk):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-5)
    assert float(jnp.abs(g_full[0]).sum()) > 0


def test_module_flatlanes_matches_flatpatch():
    """The packed module path must produce the same output as the unpacked
    one given identical params (pure layout change)."""
    rs = np.random.RandomState(23)
    b, q, c = 2, 10, 64
    shapes = ((6, 8), (3, 4), (2, 2), (2, 2))
    s = sum(hh * ww for hh, ww in shapes)
    query = jnp.asarray(rs.randn(b, q, c), jnp.float32)
    value = jnp.asarray(rs.randn(b, s, c), jnp.float32)
    for ref_dim in (2, 4):
        ref = jnp.asarray(rs.rand(b, q, len(shapes), ref_dim), jnp.float32)
        m_fp = MSDeformAttn(c, len(shapes), 4, 4, core="flatpatch")
        m_fl = MSDeformAttn(c, len(shapes), 4, 4, core="flatlanes")
        params = m_fp.init(jax.random.PRNGKey(0), query, ref, value, shapes)
        # non-zero offsets/weights so the comparison is meaningful
        params = jax.tree.map(
            lambda x: x + 0.01 * np.random.RandomState(5).randn(*x.shape).astype(x.dtype),
            params,
        )
        a = m_fp.apply(params, query, ref, value, shapes)
        bb = m_fl.apply(params, query, ref, value, shapes)
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=2e-5)


def test_roll_patchify_matches_core():
    """patchify='roll' (lane-aligned pack) must match the oracle bit-for-bit
    on every gatherable row; out-of-range sampling locations exercise the
    zero-padding weights that mask the roll variant's wrapped border
    entries."""
    from tair_tpu.spotter.ms_deform_attn import (
        ms_deform_attn_core_flatlanes,
        patchify_value,
        patchify_value_roll,
    )

    rs = np.random.RandomState(31)
    b, h, d, q, p = 2, 4, 8, 12, 4
    shapes = ((6, 8), (3, 4), (2, 2))
    s = sum(hh * ww for hh, ww in shapes)
    value = jnp.asarray(rs.randn(b, s, h, d), jnp.float32)
    locs = jnp.asarray(
        rs.uniform(-0.2, 1.2, (b, q, h, len(shapes), p, 2)), jnp.float32
    )
    attn = jnp.asarray(rs.rand(b, q, h, len(shapes), p), jnp.float32)

    ref = np.asarray(ms_deform_attn_core(value, shapes, locs, attn))
    lx, ly, aw = _pack_lanes(locs, attn)
    out = np.asarray(
        ms_deform_attn_core_flatlanes(
            value, shapes, lx, ly, aw, patchify="roll"
        )
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)

    # the packed tables agree exactly on every row a core can gather
    # (patch starts are clipped to wl-2 / hl-2 by construction)
    tc = np.asarray(patchify_value(value, shapes)).reshape(b, h, s, 4 * d)
    tr = np.asarray(patchify_value_roll(value, shapes)).reshape(b, h, s, 4 * d)
    start = 0
    for (hl, wl) in shapes:
        grid = np.arange(hl * wl).reshape(hl, wl)
        reachable = (start + grid[: max(hl - 1, 1), : max(wl - 1, 1)]).ravel()
        np.testing.assert_array_equal(tc[:, :, reachable], tr[:, :, reachable])
        start += hl * wl

    # gradients flow through the roll pack identically
    def f(v, variant):
        return ms_deform_attn_core_flatlanes(
            v, shapes, lx, ly, aw, patchify=variant
        ).sum()

    g_roll = jax.grad(f)(value, "roll")
    g_concat = jax.grad(f)(value, "concat")
    np.testing.assert_allclose(
        np.asarray(g_roll), np.asarray(g_concat), atol=1e-5
    )
