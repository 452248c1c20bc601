"""check_data layout validator vs the same fixtures the loaders use."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from helpers import tiny_config
from remixfusion_tpu.tools.check_data import (LAYOUTS, check_layout,
                                              frame_count_consistency)
from test_loaders import H, W, cam_cfg, write_frame


def test_layout_table_covers_all_registered_datasets():
    import inspect

    from remixfusion_tpu.datasets import factory
    src = inspect.getsource(factory.get_dataset)
    import re
    registered = set(re.findall(r'"(\w+)": loaders\.', src)) | {"synthetic"}
    missing = registered - set(LAYOUTS)
    assert not missing, f"no layout checklist for: {missing}"
    assert len(registered) == 12  # 11 loaders + synthetic


def test_bs3d_layout_ok_and_missing_detection(tmp_path):
    d = tmp_path / "scene"
    (d / "color").mkdir(parents=True)
    (d / "depth").mkdir()
    rows = []
    for i in range(3):
        write_frame(str(d / "color" / f"{i}.jpg"),
                    str(d / "depth" / f"{i}.png"), seed=i)
        rows.append([i, 0.1 * i, 0, 0, 0, 0, 0, 1])
    np.savetxt(d / "poses.txt", np.asarray(rows))
    cfg = tiny_config(dataset="bs3d", data={"datadir": str(d)}, **cam_cfg())
    assert check_layout(cfg) == []
    assert frame_count_consistency(cfg) == []

    (d / "poses.txt").unlink()
    problems = check_layout(cfg)
    assert len(problems) == 1 and "poses.txt" in problems[0]


def test_tum_layout_and_count_mismatch(tmp_path):
    d = tmp_path / "fr1"
    (d / "rgb").mkdir(parents=True)
    (d / "depth").mkdir()
    for i in range(2):
        t = 100.0 + i * 0.1
        write_frame(str(d / "rgb" / f"{t:.4f}.png"),
                    str(d / "depth" / f"{t:.4f}.png"), seed=i)
    (d / "rgb.txt").write_text("# rgb")
    (d / "depth.txt").write_text("# depth")
    (d / "groundtruth.txt").write_text("# gt")
    cfg = tiny_config(dataset="tum", data={"datadir": str(d)}, **cam_cfg())
    assert check_layout(cfg) == []
    # drop one depth frame -> count mismatch flagged
    next((d / "depth").iterdir()).unlink()
    assert frame_count_consistency(cfg)


def test_nonexistent_datadir(tmp_path):
    cfg = tiny_config(dataset="replica",
                      data={"datadir": str(tmp_path / "nope")}, **cam_cfg())
    problems = check_layout(cfg)
    assert problems and "does not exist" in problems[0]
