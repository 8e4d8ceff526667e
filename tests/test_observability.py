"""MetricsWriter / profiler plumbing tests — every sink is covered:
jsonl schema, TensorBoard event files (scalars, text, figures, readable
back through the event accumulator), and a profile_trace smoke that must
produce a non-empty trace directory (these sinks produced the round-3/4
roofline studies; they must not silently break)."""

import glob
import json
import os

import numpy as np
import pytest

from vfa_tpu.observability import MetricsWriter, profile_trace


def test_metrics_writer_jsonl_schema(tmp_path):
    w = MetricsWriter(str(tmp_path))
    w.scalars("train", {"loss": 1.5, "loss_heatmap": 0.5}, step=1)
    w.scalars("train", {"loss": 1.2, "loss_heatmap": 0.4}, step=2)
    w.scalars("val", {"loss": 2.0}, step=2)
    w.close()

    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert len(lines) == 3
    for rec in lines:
        # schema: tag + step + wall time + float-valued metrics
        assert isinstance(rec["tag"], str)
        assert isinstance(rec["step"], int)
        assert isinstance(rec["time"], float) and rec["time"] > 0
        for k, v in rec.items():
            if k not in ("tag", "step", "time"):
                assert isinstance(v, float), (k, v)
    assert lines[0]["tag"] == "train" and lines[0]["loss"] == 1.5
    assert lines[1]["step"] == 2
    assert lines[2]["tag"] == "val"


def test_metrics_writer_jsonl_appends_across_reopen(tmp_path):
    """Resume: a second writer on the same logdir must append, not truncate
    (train.py --resume reopens the experiment dir)."""
    w = MetricsWriter(str(tmp_path))
    w.scalars("train", {"loss": 1.0}, step=1)
    w.close()
    w = MetricsWriter(str(tmp_path))
    w.scalars("train", {"loss": 0.5}, step=2)
    w.close()
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert [r["step"] for r in lines] == [1, 2]


def test_metrics_writer_tensorboard_sinks(tmp_path):
    """TB is not optional in this image (torch is baked in): event files
    must exist and the scalars must read back with exact tags/values."""
    matplotlib = pytest.importorskip("matplotlib")
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    w = MetricsWriter(str(tmp_path))
    assert w._tb is not None, "SummaryWriter must be available (torch baked in)"
    w.scalars("train", {"loss": 1.5}, step=1)
    w.scalars("train", {"loss": 1.25}, step=2)
    w.text("config", "synthetic tiny")
    fig, ax = plt.subplots()
    ax.imshow(np.zeros((4, 4)))
    w.figure("heatmap", fig, step=1)
    plt.close(fig)
    w.close()

    tb_dir = tmp_path / "tensorboard"
    events = [f for f in os.listdir(tb_dir) if f.startswith("events")]
    assert events, "no TB event files written"

    ea_mod = pytest.importorskip(
        "tensorboard.backend.event_processing.event_accumulator")
    acc = ea_mod.EventAccumulator(str(tb_dir))
    acc.Reload()
    assert "train/loss" in acc.Tags()["scalars"]
    vals = [(e.step, e.value) for e in acc.Scalars("train/loss")]
    assert vals == [(1, 1.5), (2, 1.25)]
    assert acc.Tags()["tensors"] or acc.Tags()["images"]  # text/figure sinks


def test_profile_trace_noop_without_dir():
    with profile_trace(None):
        pass  # must be a no-op


def test_profile_trace_writes_nonempty_trace(tmp_path):
    """profile_trace must leave a non-empty TB-profile-plugin trace dir —
    the artifact tools/prof_trace.py parses."""
    import jax
    import jax.numpy as jnp

    tdir = str(tmp_path / "trace")
    with profile_trace(tdir):
        x = jnp.ones((128, 128))
        float(jnp.sum(x @ x))
    files = glob.glob(os.path.join(tdir, "**", "*"), recursive=True)
    files = [f for f in files if os.path.isfile(f)]
    assert files, "trace dir is empty"
    assert sum(os.path.getsize(f) for f in files) > 0
    # the TB profile plugin layout prof_trace.py globs for
    assert any("plugins" in f and "profile" in f for f in files), files
