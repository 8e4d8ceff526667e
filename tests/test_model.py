"""Model integration tests on tiny synthetic scenes (CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vfa_tpu.config import mc_opts, mx_opts, wt_opts
from vfa_tpu.data.synthetic import make_scene, tiny_config
from vfa_tpu.model import VFANet


@pytest.mark.parametrize("cfg", [mc_opts, wt_opts], ids=lambda c: c.name)
@pytest.mark.medium
def test_forward_shapes(cfg):
    tc = tiny_config(cfg)
    scene = make_scene(tc, seed=0, num_objects=2)
    model = VFANet(cfg=tc)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(scene.images), jnp.asarray(scene.calibs), jnp.asarray(scene.grid),
    )
    pred = model.apply(
        variables,
        jnp.asarray(scene.images), jnp.asarray(scene.calibs), jnp.asarray(scene.grid),
    )
    L, W = tc.grid_shape
    assert pred["heatmap"].shape == (1, 1, L, W)
    assert pred["loc_offset"].shape == (1, L, W, 2)
    if tc.mode == "3D":
        assert pred["dim_offset"].shape == (1, L, W, 3)
        assert pred["rotation"].shape == (1, L, W, 360)
    else:
        assert "dim_offset" not in pred
    for v in pred.values():
        assert np.isfinite(np.asarray(v)).all()


def test_forward_jits_and_differs_across_cameras():
    tc = tiny_config(mc_opts)
    scene = make_scene(tc, seed=1, num_objects=2)
    model = VFANet(cfg=tc)
    imgs = jnp.asarray(scene.images)
    calibs = jnp.asarray(scene.calibs)
    grid = jnp.asarray(scene.grid)
    variables = model.init(jax.random.PRNGKey(0), imgs, calibs, grid)

    fwd = jax.jit(lambda v, i, c, g: model.apply(v, i, c, g))
    p1 = fwd(variables, imgs, calibs, grid)
    # different images must change the output (sanity: images actually used)
    p2 = fwd(variables, imgs * 0.5, calibs, grid)
    assert not np.allclose(np.asarray(p1["heatmap"]), np.asarray(p2["heatmap"]))


@pytest.mark.medium
def test_train_step_grads_flow():
    from vfa_tpu.codec import encode_frame
    from vfa_tpu.losses import compute_loss3d
    from vfa_tpu.utils import pad_objects

    tc = tiny_config(mc_opts)
    scene = make_scene(tc, seed=2, num_objects=3)
    model = VFANet(cfg=tc)
    imgs = jnp.asarray(scene.images)
    calibs = jnp.asarray(scene.calibs)
    grid = jnp.asarray(scene.grid)
    variables = model.init(jax.random.PRNGKey(0), imgs, calibs, grid, train=True)
    params, batch_stats = variables["params"], variables["batch_stats"]

    dim_mean = jnp.asarray([145.0, 120.0, 255.0])
    objs = pad_objects(scene.objects, 16, "3D")
    gt = encode_frame(objs, scene.heatmap, cfg=tc, dim_mean=dim_mean)

    def loss_fn(p):
        pred, updates = model.apply(
            {"params": p, "batch_stats": batch_stats},
            imgs, calibs, grid, train=True, mutable=["batch_stats"],
        )
        loss, _ = compute_loss3d(pred, gt, tc.loss_weight)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    gnorm = sum(float(jnp.sum(g ** 2)) for g in flat) ** 0.5
    assert np.isfinite(gnorm) and gnorm > 0
    # backbone gets gradient through the voxel projection
    g_conv1 = grads["base"]["conv1"]["kernel"]
    assert float(jnp.abs(g_conv1).max()) > 0


@pytest.mark.medium
def test_backbone_remat_is_numerically_identical(rng):
    """nn.remat must not change params or outputs — only backward memory."""
    import jax
    import jax.numpy as jnp

    from vfa_tpu.config import TrainConfig, mc_opts
    from vfa_tpu.data.synthetic import make_scene, tiny_config
    from vfa_tpu.train_lib import create_model

    tc = tiny_config(mc_opts)
    tcfg = TrainConfig(pretrained=False)
    scene = make_scene(tc, seed=0, num_objects=2)
    imgs = jnp.asarray(scene.images)
    calibs = jnp.asarray(scene.calibs)
    grid = jnp.asarray(scene.grid)

    m0 = create_model(tc, tcfg)
    v0 = m0.init(jax.random.PRNGKey(0), imgs, calibs, grid)
    p0 = m0.apply(v0, imgs, calibs, grid)
    # stem_remat rides a fragile Flax lifted-transform idiom (resnet.py:
    # remat-bound clone discarded, conv1/gn1 attach through the implicit
    # compact context) — pin its param-tree/output parity here too so a
    # Flax upgrade that breaks it fails CI, not a training run.
    for kwargs in ({"backbone_remat": True},
                   {"backbone_remat": True, "stem_remat": True},
                   {"stem_remat": True}):
        m1 = create_model(tc, tcfg, **kwargs)
        v1 = m1.init(jax.random.PRNGKey(0), imgs, calibs, grid)
        # the lifted transform folds RNGs differently, so init VALUES
        # differ; what must match is the tree structure (checkpoint
        # compatibility) ...
        assert jax.tree_util.tree_structure(v0) == \
            jax.tree_util.tree_structure(v1), kwargs

        # ... and the function computed on identical params
        p1 = m1.apply(v0, imgs, calibs, grid)
        for k in p0:
            # fp32 reassociation under the lifted transform: ~1e-6 drift
            np.testing.assert_allclose(np.asarray(p1[k]), np.asarray(p0[k]),
                                       rtol=1e-3, atol=1e-4,
                                       err_msg=f"{kwargs} {k}")


@pytest.mark.medium
def test_chunked_backbone_matches_unchunked():
    """backbone_chunks splits the B*N trunk into rematerialized chunks; the
    outputs and gradients must match the single-pass model (up to conv float
    reassociation — same params, different batch slicing)."""
    import jax
    import jax.numpy as jnp

    from vfa_tpu.config import TrainConfig, mc_opts
    from vfa_tpu.data.synthetic import make_scene, tiny_config
    from vfa_tpu.train_lib import create_model

    tc = tiny_config(mc_opts)
    tcfg = TrainConfig(pretrained=False)
    s = make_scene(tc, seed=0, num_objects=3)
    imgs = jnp.stack([s.images, s.images])
    calibs = jnp.stack([s.calibs, s.calibs])
    grid = jnp.asarray(s.grid)

    m1 = create_model(tc, tcfg)
    m2 = create_model(tc, tcfg, backbone_chunks=2, backbone_remat=True)
    v = m1.init(jax.random.PRNGKey(0), imgs, calibs, grid)
    p1 = m1.apply(v, imgs, calibs, grid)
    p2 = m2.apply(v, imgs, calibs, grid)
    for k in p1:
        np.testing.assert_allclose(np.asarray(p1[k]), np.asarray(p2[k]),
                                   rtol=2e-3, atol=1e-4, err_msg=k)

    def loss(m, params):
        pred = m.apply(params, imgs, calibs, grid)
        return sum(jnp.sum(x.astype(jnp.float32) ** 2)
                   for x in pred.values())

    g1 = jax.grad(lambda p: loss(m1, p))(v)
    g2 = jax.grad(lambda p: loss(m2, p))(v)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=2e-2)
