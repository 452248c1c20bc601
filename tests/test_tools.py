import os

import numpy as np

from remixfusion_tpu.ops.marching_cubes import marching_cubes
from remixfusion_tpu.tools.eval_ate import align_ba, evaluate_ate
from remixfusion_tpu.tools.eval_recon import (
    calc_3d_metric, icp_align, sample_surface)
from remixfusion_tpu.tools.cull_mesh import cull_from_one_pose, cull_one_mesh
from remixfusion_tpu.utils.meshio import write_ply_mesh
from remixfusion_tpu.utils.raster import render_mesh_depth


def sphere_mesh(radius=1.0, center=(0, 0, 0), n=40):
    g = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    c = (n - 1) / 2
    scale = 2.5 * radius / n
    sdf = np.sqrt(((g - c) ** 2).sum(0)) * scale - radius
    v, f = marching_cubes(sdf, 0.0)
    v = (v - c) * scale + np.asarray(center)
    return v.astype(np.float32), f


def test_eval_recon_identical_meshes():
    # mean NN distance between two independent surface samplings scales with
    # the sampling spacing (~sqrt(area/n)), not zero
    v, f = sphere_mesh()
    m = calc_3d_metric(v, f, v, f, n_points=50000, align=False)
    assert m["accuracy_cm"] < 1.5
    assert m["completion_cm"] < 1.5
    assert m["f1"] > 0.99


def test_eval_recon_detects_offset():
    v, f = sphere_mesh()
    v2 = v + np.array([0.5, 0, 0], np.float32)
    m = calc_3d_metric(v2, f, v, f, n_points=4000, align=False,
                       com_th=0.05)
    assert m["accuracy_cm"] > 5.0
    # a small offset (within the ICP correspondence radius) is recovered
    v3 = v + np.array([0.06, 0, 0], np.float32)
    m2 = calc_3d_metric(v3, f, v, f, n_points=20000, align=True,
                        com_th=0.05)
    assert m2["accuracy_cm"] < 2.5


def test_icp_recovers_transform():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (2000, 3)).astype(np.float32)
    t = np.array([0.05, -0.03, 0.04])
    T = icp_align(pts + t, pts, n_iters=15, threshold=0.3)
    assert np.allclose(T[:3, 3], -t, atol=0.01)


def test_sample_surface_on_surface():
    v, f = sphere_mesh(radius=1.0)
    pts = sample_surface(v, f, 2000)
    r = np.linalg.norm(pts, axis=1)
    assert abs(r.mean() - 1.0) < 0.05


def test_rasterizer_depth():
    # one triangle at z=2 covering the image center
    v = np.array([[-1, -1, 2.0], [1, -1, 2.0], [0, 1.5, 2.0]], np.float32)
    f = np.array([[0, 1, 2]], np.int32)
    K = [[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]]
    d = render_mesh_depth(v, f, K, np.eye(4), 48, 64)
    assert abs(d[24, 32] - 2.0) < 1e-3
    assert d[0, 0] == 0.0  # corner outside the triangle
    # camera behind the triangle sees nothing
    c2w = np.eye(4)
    c2w[2, 3] = 5.0
    d2 = render_mesh_depth(v, f, K, c2w, 48, 64)
    assert d2.max() == 0.0


def test_cull_from_one_pose_occlusion():
    # two points along +z; a rendered depth of 1.0 occludes the far one
    pts = np.array([[0, 0, 1.0], [0, 0, 3.0]])
    K = np.array([[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]])
    depth = np.full((48, 64), 1.0, np.float32)
    inf, obs = cull_from_one_pose(pts, np.eye(4), K, 48, 64,
                                  rendered_depth=depth, eps=0.05)
    assert inf.tolist() == [1, 1]
    assert obs.tolist() == [1, 0]


def test_cull_one_mesh_removes_unseen(tmp_path):
    class FakeDS:
        fx = fy = 50.0
        cx, cy = 32.0, 24.0
        H, W = 48, 64
        frame_ids = [0]

        def K(self):
            return np.array([[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]])

    v, f = sphere_mesh(radius=0.5, center=(0, 0, 2.0))
    path = str(tmp_path / "m.ply")
    write_ply_mesh(path, v, f)
    out = str(tmp_path / "culled.ply")
    cfg = {}
    verts, observed = cull_one_mesh(
        cfg, [np.eye(4)], path, out, 1, FakeDS(), depth_flag=False,
        remove_occlusion=True)
    # camera at origin looking +z sees only the front hemisphere
    assert 0 < len(observed) < len(f)
    assert os.path.exists(out)


def test_align_ba():
    rng = np.random.default_rng(1)
    n = 20
    gt = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    gt[:, :3, 3] = rng.normal(size=(n, 3))
    offset = np.eye(4, dtype=np.float32)
    offset[:3, 3] = (1.0, -2.0, 0.5)
    est = np.einsum("ij,njk->nik", offset, gt).astype(np.float32)
    aligned, T = align_ba(est, gt)
    assert np.abs(aligned[:, :3, 3] - gt[:, :3, 3]).max() < 1e-4


def test_evaluate_ate_known_error():
    n = 30
    gt = {float(i): np.eye(4) for i in range(n)}
    est = {}
    for i in range(n):
        p = np.eye(4)
        p[0, 3] = 0.02 * (-1) ** i  # alternating +-2cm
        est[float(i)] = p
    stats = evaluate_ate(gt, est, no_align=True)
    assert abs(stats["rmse"] - 0.02) < 1e-6
