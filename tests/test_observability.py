"""MetricsWriter / profiler plumbing tests."""

import json
import os

from vfa_tpu.observability import MetricsWriter, profile_trace


def test_metrics_writer_jsonl_and_tb(tmp_path):
    w = MetricsWriter(str(tmp_path))
    w.scalars("train", {"loss": 1.5, "loss_heatmap": 0.5}, step=1)
    w.scalars("train", {"loss": 1.2, "loss_heatmap": 0.4}, step=2)
    w.text("config", "hello")
    w.close()

    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert len(lines) == 2
    assert lines[0]["tag"] == "train" and lines[0]["loss"] == 1.5
    assert lines[1]["step"] == 2
    # TB event files written when tensorboard is available
    tb_dir = tmp_path / "tensorboard"
    if tb_dir.exists():
        assert any(f.startswith("events") for f in os.listdir(tb_dir))


def test_profile_trace_noop_without_dir():
    with profile_trace(None):
        pass  # must be a no-op
