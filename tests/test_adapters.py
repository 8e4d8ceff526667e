"""Dataset adapter tests against generated on-disk mini datasets (JSON
annotations + OpenCV-XML calibrations + JPEG frames), covering calibration
parsing, annotation parsing, heatmap caches, ClassAverage, gt.txt generation,
FrameDataset splits, and the SceneLoader."""

import json
import os

import numpy as np
import pytest

from vfa_tpu.data.adapters import MultiviewC, MultiviewX, Wildtrack
from vfa_tpu.data.frame_dataset import FrameDataset, SceneLoader


def _write_opencv_xml(path, nodes):
    """Write an OpenCV FileStorage-style XML with matrix/scalar nodes."""
    lines = ['<?xml version="1.0"?>', "<opencv_storage>"]
    for name, val in nodes.items():
        val = np.atleast_2d(np.asarray(val, np.float64))
        if val.size == 1:
            lines.append(f"<{name}>{val.item()}</{name}>")
        else:
            data = " ".join(f"{x:.10g}" for x in val.ravel())
            lines.append(
                f'<{name} type_id="opencv-matrix"><rows>{val.shape[0]}</rows>'
                f"<cols>{val.shape[1]}</cols><dt>d</dt>"
                f"<data>{data}</data></{name}>"
            )
    lines.append("</opencv_storage>")
    with open(path, "w") as f:
        f.write("\n".join(lines))


def _write_images(img_dir, frames, num_cam, layout, size=(32, 48)):
    from PIL import Image

    for cam in range(1, num_cam + 1):
        if layout == "mc":
            d = os.path.join(img_dir, f"C{cam}")
            names = [f"{f:04d}.png" for f in frames]
        else:
            d = os.path.join(img_dir, f"C{cam}")
            names = [f"{f:08d}.png" for f in frames]
        os.makedirs(d, exist_ok=True)
        for name in names:
            Image.new("RGB", size, (cam * 20 % 255, 100, 50)).save(
                os.path.join(d, name))


@pytest.fixture
def mini_mc(tmp_path):
    root = tmp_path / "mc"
    num_cam, num_frame = 7, 4
    for sub in ("annotations", "calibrations/intrinsic",
                "calibrations/extrinsic"):
        os.makedirs(root / sub)
    K = np.array([[400.0, 0, 320], [0, 400, 240], [0, 0, 1]])
    for i in range(1, num_cam + 1):
        _write_opencv_xml(root / "calibrations/intrinsic" / f"intr_Camera{i}.xml",
                          {"camera_matrix": K})
        _write_opencv_xml(root / "calibrations/extrinsic" / f"extr_Camera{i}.xml",
                          {"rvec": np.array([[0.1 * i, 0.2, 0.05]]),
                           "tvec": np.array([[100.0, 50.0, 900.0]]),
                           "R_z": 45.0 * i})
    rng = np.random.default_rng(0)
    for f in range(num_frame):
        cows = [{
            "location": [float(rng.uniform(500, 3400)),
                         float(rng.uniform(500, 3400)), 0.0],
            "dimension": [float(rng.uniform(130, 150)),
                          float(rng.uniform(110, 130)),
                          float(rng.uniform(240, 270))],
            "rotation": float(rng.uniform(-180, 180)),
        } for _ in range(3)]
        with open(root / "annotations" / f"frame_{f:04d}.json", "w") as fp:
            json.dump({"C1": cows}, fp)
    _write_images(str(root / "images"), range(num_frame), num_cam, "mc")
    return str(root)


def test_multiviewc_adapter(mini_mc):
    base = MultiviewC(mini_mc)
    base.num_frame = 4  # mini dataset
    assert len(base.labels) == 4
    assert all(len(objs) == 3 for objs in base.labels)
    assert base.heatmaps.shape == (4, 156, 156)
    assert base.heatmaps.max() == 1.0
    assert base.dim_mean.shape == (3,)
    assert 130 <= base.dim_mean[0] <= 150
    assert base.calibrations.shape == (7, 3, 4)
    # rotation stored in radians
    assert all(abs(o.rotation) <= np.pi + 1e-6
               for objs in base.labels for o in objs)
    # caches reload without rebuilding
    base2 = MultiviewC(mini_mc)
    np.testing.assert_array_equal(base.heatmaps, np.asarray(base2.heatmaps))


def test_multiviewc_calibration_vs_cv2(mini_mc):
    cv2 = pytest.importorskip("cv2")
    base = MultiviewC(mini_mc)
    rvec = np.array([0.1, 0.2, 0.05])
    R_ref, _ = cv2.Rodrigues(rvec)
    np.testing.assert_allclose(base.extrinsic_matrices[0][:, :3], R_ref,
                               atol=1e-8)


def _mini_pedestrian(tmp_path, cls, num_cam, num_frame, pos_mod, intr_names,
                     extr_names, intr_dir):
    root = tmp_path / cls.__name__.lower()
    os.makedirs(root / "annotations_positions")
    os.makedirs(root / f"calibrations/{intr_dir}")
    os.makedirs(root / "calibrations/extrinsic")
    K = np.array([[800.0, 0, 960], [0, 800, 540], [0, 0, 1]])
    for i in range(num_cam):
        _write_opencv_xml(root / f"calibrations/{intr_dir}" / intr_names[i],
                          {"camera_matrix": K})
        _write_opencv_xml(root / "calibrations/extrinsic" / extr_names[i],
                          {"rvec": np.array([[0.05 * (i + 1), 0.1, 0.02]]),
                           "tvec": np.array([[10.0, 5.0, 90.0]])})
    rng = np.random.default_rng(1)
    for f in range(num_frame):
        peds = []
        for _ in range(4):
            pid = int(rng.integers(0, pos_mod * 100))
            views = [{"viewNum": c, "xmin": 10, "xmax": 50, "ymin": 5,
                      "ymax": 60} for c in range(num_cam)]
            peds.append({"positionID": pid, "views": views})
        with open(root / "annotations_positions" / f"{f:08d}.json", "w") as fp:
            json.dump(peds, fp)
    os.makedirs(root / "Image_subsets", exist_ok=True)
    _write_images(str(root / "Image_subsets"), range(num_frame), num_cam, "x")
    return str(root)


def test_multiviewx_adapter(tmp_path):
    from vfa_tpu.data.adapters import _MX_EXTR, _MX_INTR

    root = _mini_pedestrian(tmp_path, MultiviewX, 6, 4, 1000,
                            _MX_INTR, _MX_EXTR, "intrinsic")
    base = MultiviewX(root)
    base.num_frame = 4
    assert len(base.labels) == 4
    assert base.heatmaps.shape == (4, 160, 250)
    # gt.txt written with the (fixed) prepare_gt
    gt = np.loadtxt(os.path.join(root, "gt.txt"))
    assert gt.shape[1] == 3
    # positionID decoding: x = pos % 1000, y = pos // 1000
    o = base.labels[0][0]
    assert 0 <= o.location[0] < 1000


def test_wildtrack_adapter(tmp_path):
    from vfa_tpu.data.adapters import _WT_EXTR, _WT_INTR

    root = _mini_pedestrian(tmp_path, Wildtrack, 7, 10, 480,
                            _WT_INTR, _WT_EXTR, "intrinsic_zero")
    base = Wildtrack(root)
    assert base.heatmaps.shape[1:] == (120, 360)
    o = base.labels[0][0]
    assert 0 <= o.location[0] < 480


def test_frame_dataset_and_loader(mini_mc):
    import dataclasses

    from vfa_tpu.config import mc_opts

    base = MultiviewC(mini_mc)
    base.num_frame = 4
    cfg = dataclasses.replace(mc_opts, root=mini_mc, resize_size=(32, 48))
    train = FrameDataset(base, cfg, split="train", train_ratio=0.75)
    val = FrameDataset(base, cfg, split="val", train_ratio=0.75)
    assert len(train) == 3 and len(val) == 1

    item = train[0]
    assert item["images"].shape == (7, 32, 48, 3)
    assert item["calibs"].shape == (7, 3, 4)
    assert item["heatmap"].shape == (156, 156)
    assert 0.0 <= item["images"].min() and item["images"].max() <= 1.0

    loader = SceneLoader(train, batch_size=2, shuffle=True, max_objects=8)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["images"].shape == (2, 7, 32, 48, 3)
    assert b["location"].shape == (2, 8, 3)
    assert b["valid"].sum() == 6  # 3 objects per frame
    assert b["dimension"].shape == (2, 8, 3)


def test_loader_uint8_staging_matches_float(mini_mc):
    """images_dtype=uint8 (4x-smaller H2D staging) must be the quantized
    float pipeline, batch for batch."""
    import dataclasses

    from vfa_tpu.config import mc_opts

    base = MultiviewC(mini_mc)
    base.num_frame = 4
    cfg = dataclasses.replace(mc_opts, root=mini_mc, resize_size=(32, 48))
    train = FrameDataset(base, cfg, split="train", train_ratio=0.75)

    kw = dict(batch_size=2, shuffle=False, max_objects=8)
    bf = list(SceneLoader(train, **kw))
    bu = list(SceneLoader(train, images_dtype=np.uint8, **kw))
    assert len(bf) == len(bu)
    for f, u in zip(bf, bu):
        assert u["images"].dtype == np.uint8
        np.testing.assert_allclose(u["images"].astype(np.float32) / 255.0,
                                   f["images"], atol=1.0 / 255.0)
        np.testing.assert_array_equal(u["frame"], f["frame"])
