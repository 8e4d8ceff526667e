"""Compiled-rig voxel sampling must reproduce the reference-semantics jnp
path exactly (float32)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vfa_tpu.config import mc_opts, mx_opts, wt_opts
from vfa_tpu.data.synthetic import make_calibrations, tiny_config
from vfa_tpu.geometry import make_grid
from vfa_tpu.ops.rig import build_rig, pyramid_feat_shapes, rig_sample_scale
from vfa_tpu.ops.voxel import sample_voxels, voxel_boxes


@pytest.mark.parametrize("cfg", [mc_opts, mx_opts, wt_opts], ids=lambda c: c.name)
def test_rig_matches_reference_path(cfg, rng):
    tc = tiny_config(cfg)
    grid = make_grid(tc.world_size, tc.cube_size[:2], tc.name)
    calibs = make_calibrations(tc, 2)
    B, N, C = 2, 2, 8
    fh, fw = tc.resize_size[0] // 8, tc.resize_size[1] // 8

    rig = build_rig(calibs, tc, grid, [(fh, fw)], tile_v=16,
                    dtype=jnp.float32)
    sr = rig.scales[0]
    nl = sr.nl
    kernel = jnp.asarray(rng.normal(size=(C * nl, 12)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(12,)).astype(np.float32))

    lat = jnp.asarray(rng.normal(size=(B, N, fh, fw, C)).astype(np.float32))
    out = rig_sample_scale(lat, sr, kernel, bias)       # (B, N, V2d, 12)

    # reference path: sample_voxels + collapse + relu per (scene, cam)
    L, W = tc.grid_shape
    for b in range(B):
        for n in range(N):
            boxes = voxel_boxes(
                jnp.asarray(calibs[n]), jnp.asarray(grid), dataset=tc.name,
                grid_height=tc.grid_h, cube_size=tc.cube_size,
                image_size=tc.image_size,
            )
            vox = sample_voxels(jnp.transpose(lat[b, n], (2, 0, 1)), boxes)
            want = jax.nn.relu(vox.reshape(L * W, C * nl) @ kernel + bias)
            got = out[b, n]
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-3, atol=2e-4)


def test_rig_multiscale_shapes():
    tc = tiny_config(mc_opts)
    grid = make_grid(tc.world_size, tc.cube_size[:2], tc.name)
    calibs = make_calibrations(tc, 2)
    shapes = [(tc.resize_size[0] // s, tc.resize_size[1] // s)
              for s in (8, 16, 32)]
    rig = build_rig(calibs, tc, grid, shapes, tile_v=16, dtype=jnp.float32)
    assert len(rig.scales) == 3
    L, W = tc.grid_shape
    for sr, (fh, fw) in zip(rig.scales, shapes):
        assert sr.inv_perm.shape == (2, L * W)
        for a, st in zip(sr.A, sr.starts):
            assert a.shape[0] == 2
            assert a.shape[-1] % 8 == 0
            assert st.shape[0] == 2


@pytest.mark.medium
def test_train_step_with_rig_matches_reference_path(rng):
    """A full train step through the rig path must match the dynamic path
    (same grads, same loss) in float32."""
    import jax

    from vfa_tpu.config import TrainConfig, mc_opts
    from vfa_tpu.data.synthetic import make_scene, tiny_config
    from vfa_tpu.train_lib import create_model, init_state, make_train_step
    from vfa_tpu.utils import pad_objects

    tc = tiny_config(mc_opts)
    tcfg = TrainConfig(epochs=4, lr=1e-3, pretrained=False,
                       scheduler_step_per_epoch=False)
    model = create_model(tc, tcfg)
    scenes = [make_scene(tc, seed=s, num_objects=3) for s in range(2)]
    objs = [pad_objects(s.objects, 8, "3D") for s in scenes]
    batch = {
        "images": jnp.stack([s.images for s in scenes]),
        "calibs": jnp.stack([s.calibs for s in scenes]),
        "grid": jnp.asarray(scenes[0].grid),
        "heatmap": jnp.stack([s.heatmap for s in scenes]),
        "location": jnp.stack([o["location"] for o in objs]),
        "valid": jnp.stack([o["valid"] for o in objs]),
        "dimension": jnp.stack([o["dimension"] for o in objs]),
        "rotation": jnp.stack([o["rotation"] for o in objs]),
    }
    state, tx = init_state(model, tc, tcfg, jax.random.PRNGKey(0), 2, batch)
    dim_mean = np.array([145.0, 120.0, 255.0], np.float32)
    step = make_train_step(model, tx, tc, tcfg, dim_mean=dim_mean)

    rig = build_rig(scenes[0].calibs, tc,
                    make_grid(tc.world_size, tc.cube_size[:2], tc.name),
                    pyramid_feat_shapes(tc.resize_size),
                    tile_v=16, dtype=jnp.float32)

    # train_step donates its input state; give each call its own copy
    copy = lambda s: jax.tree_util.tree_map(jnp.array, s)
    s_ref, ld_ref = step(copy(state), batch)
    s_rig, ld_rig = step(copy(state), batch, rig)
    assert float(ld_rig["loss"]) == pytest.approx(float(ld_ref["loss"]), rel=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.params),
                    jax.tree_util.tree_leaves(s_rig.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3,
                                   atol=1e-5)


@pytest.mark.parametrize("B", [2, 8])
def test_pallas_rig_matches_xla_rig_interpret(B, rng):
    """The fused Pallas kernel (interpret mode on CPU) must match the XLA
    scan formulation exactly. B=8 exercises the scene-packed (S>1) fwd
    kernel path."""
    from vfa_tpu.ops.rig import pyramid_feat_shapes
    from vfa_tpu.ops.rig_pallas import rig_sample_scale_pallas

    tc = tiny_config(mc_opts)
    grid = make_grid(tc.world_size, tc.cube_size[:2], tc.name)
    calibs = make_calibrations(tc, 2)
    shapes = pyramid_feat_shapes(tc.resize_size)
    rig = build_rig(calibs, tc, grid, shapes[:1], tile_v=16, dtype=jnp.float32)
    sr = rig.scales[0]
    N, C = 2, 8
    fh, fw = shapes[0]
    lat = jnp.asarray(rng.normal(size=(B, N, fh, fw, C)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(C * sr.nl, 12)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(12,)).astype(np.float32))

    ref = rig_sample_scale(lat, sr, k, b)
    got = rig_sample_scale_pallas(lat, sr, k, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("buckets", [2, 3])
def test_bucketed_rig_matches_reference_path(buckets, rng):
    """Bucketed band widths must not change the numerics."""
    tc = tiny_config(mc_opts)
    grid = make_grid(tc.world_size, tc.cube_size[:2], tc.name)
    calibs = make_calibrations(tc, 2)
    fh, fw = tc.resize_size[0] // 8, tc.resize_size[1] // 8
    B, N, C = 2, 2, 8

    rig1 = build_rig(calibs, tc, grid, [(fh, fw)], tile_v=16,
                     dtype=jnp.float32)
    rigb = build_rig(calibs, tc, grid, [(fh, fw)], tile_v=16,
                     dtype=jnp.float32, band_buckets=buckets)
    # DP edges may merge buckets when that wastes no padding
    assert 1 <= len(rigb.scales[0].A) <= buckets
    nl = rig1.scales[0].nl
    kernel = jnp.asarray(rng.normal(size=(C * nl, 12)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(12,)).astype(np.float32))
    lat = jnp.asarray(rng.normal(size=(B, N, fh, fw, C)).astype(np.float32))

    out1 = rig_sample_scale(lat, rig1.scales[0], kernel, bias)
    outb = rig_sample_scale(lat, rigb.scales[0], kernel, bias)
    np.testing.assert_allclose(np.asarray(outb), np.asarray(out1),
                               rtol=1e-4, atol=1e-5)

    # pallas interpret path too
    from vfa_tpu.ops.rig_pallas import rig_sample_scale_pallas

    outp = rig_sample_scale_pallas(lat, rigb.scales[0], kernel, bias,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(outp), np.asarray(out1),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("layout", ["flat", "window"])
def test_window_rig_matches_flat(layout, rng):
    """The 2D-window band layout must reproduce the flat layout exactly
    (same prefix-folded weights, only regrouped into compact windows)."""
    tc = tiny_config(wt_opts)
    grid = make_grid(tc.world_size, tc.cube_size[:2], tc.name)
    calibs = make_calibrations(tc, 2)
    fh, fw = tc.resize_size[0] // 8, tc.resize_size[1] // 8
    B, N, C = 2, 2, 8

    rig_f = build_rig(calibs, tc, grid, [(fh, fw)], tile_v=16,
                      dtype=jnp.float32)
    rig_l = build_rig(calibs, tc, grid, [(fh, fw)], tile_v=16,
                      dtype=jnp.float32, layout=layout, band_buckets=2)
    if layout == "window":
        assert rig_l.scales[0].window_hw, "window layout must set window_hw"
        for (wh, ww), s_b in zip(rig_l.scales[0].window_hw,
                                 rig_l.scales[0].starts):
            assert ww % 16 == 0 and wh % 8 == 0
            assert (np.asarray(s_b)[..., 1] % 8 == 0).all()
    nl = rig_f.scales[0].nl
    k = jnp.asarray(rng.normal(size=(C * nl, 12)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(12,)).astype(np.float32))
    lat = jnp.asarray(rng.normal(size=(B, N, fh, fw, C)).astype(np.float32))
    of = rig_sample_scale(lat, rig_f.scales[0], k, b)
    ol = rig_sample_scale(lat, rig_l.scales[0], k, b)
    np.testing.assert_allclose(np.asarray(ol), np.asarray(of),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("layout", ["flat", "window"])
@pytest.mark.parametrize("buckets", [1, 2])
@pytest.mark.parametrize("B", [2, 4])
def test_pallas_rig_vjp_matches_xla_interpret(B, buckets, layout, rng):
    """The hand-written backward kernel (transposed banded matmul) must
    produce the same lat/kernel gradients as XLA autodiff of the scan
    formulation (fp32, interpret mode). B=4 exercises the scene-packed
    (S=2) pipelined bwd kernel."""
    from vfa_tpu.ops.rig import pyramid_feat_shapes
    from vfa_tpu.ops.rig_pallas import rig_sample_scale_pallas

    tc = tiny_config(mc_opts)
    grid = make_grid(tc.world_size, tc.cube_size[:2], tc.name)
    calibs = make_calibrations(tc, 2)
    shapes = pyramid_feat_shapes(tc.resize_size)
    rig = build_rig(calibs, tc, grid, shapes[:1], tile_v=16,
                    dtype=jnp.float32, band_buckets=buckets, layout=layout)
    sr = rig.scales[0]
    N, C = 2, 8
    fh, fw = shapes[0]
    lat = jnp.asarray(rng.normal(size=(B, N, fh, fw, C)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(C * sr.nl, 12)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(12,)).astype(np.float32))
    # non-uniform weights so the relu/bias chain feeds a non-trivial cotangent
    w = jnp.asarray(rng.normal(size=(B, N, sr.inv_perm.shape[1], 12))
                    .astype(np.float32))

    def loss_xla(lat, k):
        return jnp.sum(rig_sample_scale(lat, sr, k, b) * w)

    def loss_pal(lat, k):
        return jnp.sum(rig_sample_scale_pallas(lat, sr, k, b,
                                               interpret=True) * w)

    gx_lat, gx_k = jax.grad(loss_xla, argnums=(0, 1))(lat, k)
    gp_lat, gp_k = jax.grad(loss_pal, argnums=(0, 1))(lat, k)
    np.testing.assert_allclose(np.asarray(gp_lat), np.asarray(gx_lat),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gp_k), np.asarray(gx_k),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.medium
def test_pallas_rig_bf16_buffers_close_to_fp32():
    """bf16 features flow through bf16 HBM buffers (tiles out, cotangent,
    dII accumulator — each MXU accumulation still fp32 in VMEM, rounding
    only on the HBM store). The fwd and both grads must stay within bf16
    rounding of the fp32 path: the cross-window dII accumulation adds only
    a few same-magnitude terms per pixel, so the error budget is a couple
    of bf16 ulps, not a precision cliff.

    Own fixed generator (not the session rng fixture): the bound sits a
    small factor above the observed error, so the inputs must not depend
    on which tests ran before this one."""
    rng = np.random.default_rng(20260818)
    from vfa_tpu.ops.rig import pyramid_feat_shapes
    from vfa_tpu.ops.rig_pallas import rig_sample_scale_pallas

    tc = tiny_config(mc_opts)
    grid = make_grid(tc.world_size, tc.cube_size[:2], tc.name)
    calibs = make_calibrations(tc, 2)
    shapes = pyramid_feat_shapes(tc.resize_size)
    rig = build_rig(calibs, tc, grid, shapes[:1], tile_v=16,
                    dtype=jnp.float32, band_buckets=2, layout="window")
    sr = rig.scales[0]
    B, N, C = 4, 2, 8
    fh, fw = shapes[0]
    lat = jnp.asarray(rng.normal(size=(B, N, fh, fw, C)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(C * sr.nl, 12)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(12,)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(B, N, sr.inv_perm.shape[1], 12))
                    .astype(np.float32))

    def loss(lat, k, dtype):
        o = rig_sample_scale_pallas(lat.astype(dtype), sr, k.astype(dtype),
                                    b.astype(dtype), out_dtype=jnp.float32,
                                    interpret=True)
        return jnp.sum(o * w), o

    (_, o32), (g32_lat, g32_k) = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(lat, k, jnp.float32)
    (_, o16), (g16_lat, g16_k) = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(lat, k, jnp.bfloat16)

    scale_o = float(jnp.max(jnp.abs(o32)))
    np.testing.assert_allclose(np.asarray(o16), np.asarray(o32),
                               atol=0.03 * scale_o)
    for g16, g32 in ((g16_lat, g32_lat), (g16_k, g32_k)):
        a = np.asarray(g16, np.float32)
        b_ = np.asarray(g32, np.float32)
        # relative L2 is the meaningful metric for accumulated rounding;
        # individual elements can see cancellation noise of a few bf16 ulps
        rel_l2 = np.linalg.norm(a - b_) / np.linalg.norm(b_)
        assert rel_l2 < 0.03, rel_l2  # observed 0.0075 at this seed
        np.testing.assert_allclose(a, b_, atol=0.1 * np.abs(b_).max())
