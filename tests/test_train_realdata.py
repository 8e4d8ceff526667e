"""Real-data train CLI smoke on the generated mini MultiviewC dataset.

Covers the uint8-staged + on-device-ColorJitter loader wiring that is the
train CLI's default for on-disk datasets (train.py make_loaders /
stage_images) — the synthetic CLI smokes never touch it. Mirrors the
reference's train loop contract (`/root/reference/train.py:200-286`)."""

import os
import subprocess
import sys

import pytest

from test_adapters import mini_mc  # noqa: F401  (pytest fixture)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_train_cli_real_data_device_jitter(mini_mc, tmp_path):  # noqa: F811
    env = {**os.environ, "VFA_TPU_PLATFORM": "cpu"}
    r = subprocess.run(
        [sys.executable, "train.py", "--data", "MultiviewC",
         "--root", str(mini_mc), "--resize_size", "32", "48",
         # coarse voxels: 39x39 BEV grid keeps the dynamic path's CPU cost
         # test-sized (the full 156x156 grid needs ~20 min on one core)
         "--cube_size", "100", "100", "5",
         "-e", "1", "--pretrained", "0", "--no_rig",
         "--savedir", str(tmp_path), "--vis_iter", "0"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=1200)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])
    assert "[VAL] epoch 1" in r.stdout
    # the device-jitter path must actually be active on this dataset
    # (images decode from disk and --no_augment was not passed)
    assert "loss=" in r.stdout
