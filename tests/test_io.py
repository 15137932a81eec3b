"""IO-layer regression tests: label routing, GT cache paths, async writes."""

import os

import numpy as np
import pytest

from tracknetv3_tpu.utils.io import get_match_median, label_csv_path


def test_label_csv_path_routes_by_split_component():
    # test split -> corrected labels (reference dataset.py:222-226)
    assert label_csv_path("/data/test/match1", "1_0_0").endswith(
        os.path.join("test", "match1", "corrected_csv", "1_0_0_ball.csv")
    )
    # train/val -> raw csv
    assert "corrected" not in label_csv_path("/data/train/match1", "1_0_0")
    assert "corrected" not in label_csv_path("/data/val/match2", "1_0_0")
    # a 'test' component elsewhere in the path must NOT trigger corrected
    # routing (the old substring check did)
    assert "corrected" not in label_csv_path("/srv/test/data/train/match1", "1_0_0")
    # relative paths
    assert "corrected" in label_csv_path(os.path.join("test", "match3"), "1_0_0")


def test_gt_coco_json_path_is_split_and_drop_dependent(tmp_path):
    from tracknetv3_tpu.evaluation.coco import gt_coco_json_path

    paths = {
        gt_coco_json_path(str(tmp_path), "val"),
        gt_coco_json_path(str(tmp_path), "test"),
        gt_coco_json_path(str(tmp_path), "test", drop=True),
    }
    assert len(paths) == 3  # distinct caches; no cross-split reuse


def test_get_match_median_empty_match_raises(tmp_path):
    match = tmp_path / "train" / "match1"
    (match / "frame").mkdir(parents=True)
    with pytest.raises(ValueError, match="no rally frame dirs"):
        get_match_median(str(match))


def test_async_checkpoint_write_error_surfaces(tmp_path):
    """A failed async write must raise at flush, not vanish in the worker
    thread (a full disk must not let training 'succeed' silently)."""
    from tracknetv3_tpu.training.checkpoint import (
        flush_checkpoint_writes,
        save_checkpoint,
    )

    target_dir = tmp_path / "gone"
    target_dir.mkdir()
    path = str(target_dir / "ck.pt")
    os.rmdir(target_dir)  # make the write fail
    save_checkpoint(
        path,
        epoch=0,
        max_val_acc=0.0,
        model={"params": {"w": np.zeros(2, np.float32)}, "batch_stats": {}},
        async_write=True,
    )
    with pytest.raises(FileNotFoundError):
        flush_checkpoint_writes()
    # and the writer machinery still works afterwards
    ok_path = str(tmp_path / "ok.pt")
    save_checkpoint(
        ok_path,
        epoch=0,
        max_val_acc=0.0,
        model={"params": {"w": np.zeros(2, np.float32)}, "batch_stats": {}},
        async_write=True,
    )
    flush_checkpoint_writes()
    assert os.path.exists(ok_path)
