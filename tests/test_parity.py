"""End-to-end numerical parity against the actual reference implementation.

Builds the reference PyTorch VFANet (imported from /root/reference — never
copied), randomly initialized, converts its state dict through
vfa_tpu.convert, runs both models on identical inputs, and compares the
prediction dicts. This validates the whole stack at once: conv/GN layouts
and epsilons, the voxel projection + grid_sample semantics, fuse BN, heads,
and the checkpoint converter key mapping.

Skipped when the reference checkout is unavailable.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "vfa")),
    reason="reference checkout not available",
)


@pytest.fixture(scope="module")
def ref_modules():
    # the reference imports torchvision (not installed here) only for dataset
    # base classes it doesn't need at model-build time — stub it
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        datasets = types.ModuleType("torchvision.datasets")
        vision = types.ModuleType("torchvision.datasets.vision")

        class VisionDataset:  # minimal stand-in
            def __init__(self, *a, **k):
                pass

        datasets.VisionDataset = VisionDataset
        vision.VisionDataset = VisionDataset
        transforms = types.ModuleType("torchvision.transforms")

        class ToTensor:
            pass

        transforms.ToTensor = ToTensor
        tv.datasets = datasets
        tv.transforms = transforms
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.datasets"] = datasets
        sys.modules["torchvision.datasets.vision"] = vision
        sys.modules["torchvision.transforms"] = transforms

    sys.path.insert(0, REFERENCE)
    try:
        import torch  # noqa: F401

        from vfa.model.vfanet import VFANet as RefVFANet  # type: ignore

        yield RefVFANet
    finally:
        sys.path.remove(REFERENCE)


def _ref_args(tc):
    # minimal args namespace the reference model reads
    # (`vfa/model/vfa_op.py:37-44,75`: args.data, args.image_size)
    return types.SimpleNamespace(
        data=tc.name, image_size=list(tc.image_size), grid_scale=tc.grid_scale,
    )


@pytest.mark.parametrize("dataset", ["MultiviewC", "MultiviewX", "Wildtrack"])
def test_forward_parity_with_reference(ref_modules, dataset, rng):
    import torch

    from vfa_tpu.config import TrainConfig, get_config
    from vfa_tpu.convert import convert_state_dict
    from vfa_tpu.data.synthetic import make_scene, tiny_config
    from vfa_tpu.train_lib import create_model

    RefVFANet = ref_modules
    tc = tiny_config(get_config(dataset))
    scene = make_scene(tc, seed=0, num_objects=3)

    torch.manual_seed(0)
    ref = RefVFANet(
        args=_ref_args(tc), grid_height=tc.grid_h,
        cube_size=list(tc.cube_size), angle_range=360, mode=tc.mode,
        pretrained=False,
    )
    ref.eval()

    model = create_model(tc, TrainConfig(pretrained=False))
    imgs = jnp.asarray(scene.images)
    calibs = jnp.asarray(scene.calibs)
    grid = jnp.asarray(scene.grid)
    variables = model.init(jax.random.PRNGKey(0), imgs, calibs, grid)

    params, batch_stats = convert_state_dict(
        ref.state_dict(), variables["params"], variables.get("batch_stats", {})
    )
    pred = model.apply(
        {"params": params, "batch_stats": batch_stats}, imgs, calibs, grid,
        train=False,
    )

    with torch.no_grad():
        t_imgs = torch.from_numpy(
            np.transpose(scene.images, (0, 3, 1, 2)).copy())
        t_calibs = torch.from_numpy(scene.calibs.copy())
        t_grid = torch.from_numpy(scene.grid.copy())[None]
        ref_pred = ref(t_imgs, t_calibs, t_grid)

    for key in ref_pred:
        ours = np.asarray(pred[key])
        want = ref_pred[key].numpy()
        assert ours.shape == want.shape, key
        np.testing.assert_allclose(
            ours, want, rtol=5e-3, atol=5e-4,
            err_msg=f"mismatch in {key}",
        )


def test_converter_consumes_every_reference_key(ref_modules):
    """Every tensor in the reference state dict must be either mapped or an
    explicitly skipped buffer — no silent drops."""
    import torch

    from vfa_tpu.config import TrainConfig, get_config
    from vfa_tpu.convert import convert_state_dict
    from vfa_tpu.data.synthetic import make_scene, tiny_config
    from vfa_tpu.train_lib import create_model

    tc = tiny_config(get_config("MultiviewC"))
    torch.manual_seed(1)
    ref = ref_modules(args=_ref_args(tc), grid_height=tc.grid_h,
                      cube_size=list(tc.cube_size), mode="3D", pretrained=False)
    model = create_model(tc, TrainConfig(pretrained=False))
    scene = make_scene(tc, seed=0, num_objects=1)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(scene.images),
        jnp.asarray(scene.calibs), jnp.asarray(scene.grid))
    # strict=True raises on any unmapped key
    convert_state_dict(ref.state_dict(), variables["params"],
                       variables.get("batch_stats", {}), strict=True)
