"""Live HTTP viewer unit tests (remixfusion_tpu/tools/live_viewer.py —
the headless replacement for the reference's open3d live viewer,
reference tools/viz.py:1-210)."""

import json
import urllib.request

import numpy as np

from remixfusion_tpu.tools.live_viewer import LiveViewer, encode_bmp


def _get(url):
    return urllib.request.urlopen(url, timeout=10).read()


def test_live_viewer_endpoints():
    v = LiveViewer(port=0, host="127.0.0.1")
    base = f"http://127.0.0.1:{v.port}"
    try:
        # before any publish: page serves, frame 404s, state is empty
        assert b"remixfusion_tpu" in _get(base + "/")
        try:
            urllib.request.urlopen(base + "/frame", timeout=10)
            assert False, "expected 404 before first frame"
        except urllib.error.HTTPError as e:
            assert e.code == 404

        v.publish_frame(np.random.rand(24, 32, 3))  # float path
        v.publish_state(
            frame=7, n=100, fps=16.5,
            est=np.tile(np.eye(4, dtype=np.float32), (5, 1, 1)),
            gt=np.zeros((5, 3), np.float32), extra={"ate_cm": 0.76})

        st = json.loads(_get(base + "/state.json"))
        assert st["frame"] == 7 and st["n"] == 100
        assert abs(st["fps"] - 16.5) < 1e-6
        assert len(st["est"]) == 5 and len(st["gt"]) == 5
        assert st["extra"]["ate_cm"] == 0.76

        body = _get(base + "/frame")
        # jpeg (imageio present) or bmp (stdlib fallback)
        assert body[:3] == b"\xff\xd8\xff" or body[:2] == b"BM"

        # encode cache invalidates on republish
        seq0 = st["seq"]
        v.publish_frame(np.zeros((24, 32, 3), np.uint8))
        st2 = json.loads(_get(base + "/state.json"))
        assert st2["seq"] == seq0 + 1
        assert len(_get(base + "/frame")) > 0
    finally:
        v.stop()


def test_state_downsamples_long_trajectories():
    v = LiveViewer(port=0, host="127.0.0.1")
    try:
        poses = np.tile(np.eye(4, dtype=np.float32), (2000, 1, 1))
        poses[:, 0, 3] = np.linspace(0, 1, 2000)
        v.publish_state(frame=1999, est=poses, max_pts=400)
        st = json.loads(
            _get(f"http://127.0.0.1:{v.port}/state.json"))
        assert len(st["est"]) <= 401
        # endpoints preserved in order
        assert st["est"][0][0] == 0.0
        assert st["est"][-1][0] > 0.99
    finally:
        v.stop()


def test_bmp_encoder_layout():
    rgb = np.zeros((2, 3, 3), np.uint8)
    rgb[0, 0] = [255, 0, 0]  # top-left red
    data = encode_bmp(rgb)
    assert data[:2] == b"BM"
    # 24-bit, 3px rows pad to 12 bytes; bottom-up => red is in the LAST row
    off = int.from_bytes(data[10:14], "little")
    last_row = data[off + 12: off + 24]
    assert last_row[:3] == b"\x00\x00\xff"  # BGR red
