"""Tests for observability + IO utilities."""

import json
import os.path as osp

import numpy as np

from se3et_tpu.utils import pointcloud_io
from se3et_tpu.utils.metrics_writer import MetricsWriter
from se3et_tpu.utils.summary import AverageMeter, SummaryBoard, Timer


def test_average_meter():
    m = AverageMeter()
    m.update([1.0, 2.0, 3.0])
    assert m.mean() == 2.0
    assert m.sum() == 6.0
    assert m.median() == 2.0
    m2 = AverageMeter(last_n=2)
    m2.update([1.0, 2.0, 3.0])
    assert m2.mean() == 2.5


def test_summary_board():
    b = SummaryBoard()
    b.update_from_dict({"loss": 1.0, "acc": 0.5})
    b.update_from_dict({"loss": 3.0, "acc": 0.7})
    s = b.summary()
    assert s["loss"] == 2.0
    assert abs(s["acc"] - 0.6) < 1e-9
    assert "loss" in b.format()


def test_timer():
    t = Timer()
    t.tic()
    t.record_prepare()
    t.record_process()
    assert t.prepare_time >= 0.0 and t.process_time >= 0.0


def test_metrics_writer(tmp_path):
    w = MetricsWriter(str(tmp_path))
    w.add_scalar("loss", 1.5, step=1)
    w.add_dict({"a": 2.0, "b": "skip-me"}, step=2, prefix="val/")
    w.close()
    lines = [json.loads(x) for x in open(osp.join(tmp_path, "events.jsonl"))]
    assert lines[0]["loss"] == 1.5
    assert lines[1]["val/a"] == 2.0
    assert "val/b" not in lines[1]


def test_ply_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    path = str(tmp_path / "cloud.ply")
    pointcloud_io.write_ply(path, pts)
    back = pointcloud_io.read_ply(path)
    np.testing.assert_allclose(back, pts, atol=1e-6)

    colors = pointcloud_io.feature_colors(rng.normal(size=(50, 16)))
    assert colors.shape == (50, 3)
    assert colors.min() >= 0.0 and colors.max() <= 1.0
    pointcloud_io.write_ply(str(tmp_path / "colored.ply"), pts, colors=colors)
    pointcloud_io.write_correspondence_ply(
        str(tmp_path / "corr.ply"), pts[:10], pts[10:20]
    )
    assert osp.getsize(str(tmp_path / "corr.ply")) > 0


def test_morton_order_locality():
    from se3et_tpu.data.host_ops import morton_order

    rng = np.random.RandomState(1)
    pts = rng.uniform(-1, 1, size=(2000, 3)).astype(np.float32)
    order = morton_order(pts)
    assert sorted(order.tolist()) == list(range(2000))
    sorted_pts = pts[order]
    # consecutive points after sorting are much closer than random order
    d_sorted = np.linalg.norm(np.diff(sorted_pts, axis=0), axis=1).mean()
    d_random = np.linalg.norm(np.diff(pts, axis=0), axis=1).mean()
    assert d_sorted < 0.5 * d_random
