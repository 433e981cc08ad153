"""g2o reader/writer round-trips and synthetic dataset sanity."""

import numpy as np

from graphslam_tpu.io import datasets, load_g2o, save_g2o


class TestG2O:
    def test_roundtrip_se2(self, tmp_path):
        data = datasets.manhattan(n_poses=50, seed=7)
        path = str(tmp_path / "test2d.g2o")
        save_g2o(path, data)
        back = load_g2o(path, use_native=False)
        assert back["dim"] == 2
        assert np.allclose(back["poses"], data["poses"], atol=1e-5)
        assert np.array_equal(back["edges"], data["edges"])
        assert np.allclose(back["measurements"], data["measurements"], atol=1e-5)
        assert np.allclose(back["information"], data["information"], rtol=1e-5)

    def test_roundtrip_se3(self, tmp_path):
        data = datasets.sphere(n_rings=4, poses_per_ring=6, radius=3.0)
        path = str(tmp_path / "test3d.g2o")
        save_g2o(path, data)
        back = load_g2o(path, use_native=False)
        assert back["dim"] == 3
        # Rotations go through quaternions; compare R and t separately.
        assert np.allclose(back["poses"][:, 9:], data["poses"][:, 9:], atol=1e-5)
        assert np.allclose(back["poses"][:, :9], data["poses"][:, :9], atol=1e-4)
        assert np.allclose(back["measurements"][:, :9], data["measurements"][:, :9], atol=1e-4)
        assert np.allclose(back["information"], data["information"], rtol=1e-4)


class TestDatasets:
    def test_manhattan_shapes(self):
        d = datasets.manhattan(n_poses=200, seed=1)
        assert d["poses"].shape == (200, 3)
        assert d["edges"].shape[0] == d["measurements"].shape[0]
        assert d["edges"].max() < 200
        assert (d["edges"][:, 0] < d["edges"][:, 1]).all()
        # Odometry chain present.
        assert (d["edges"][:199, 1] == d["edges"][:199, 0] + 1).all()
        # Some loop closures exist.
        assert d["is_loop"].sum() > 0

    def test_sphere_valid_rotations(self):
        d = datasets.sphere(n_rings=5, poses_per_ring=8)
        R = d["gt"][:, :9].reshape(-1, 3, 3)
        RtR = np.einsum("nji,njk->nik", R, R)
        assert np.allclose(RtR, np.eye(3)[None], atol=1e-5)

    def test_deterministic(self):
        a = datasets.manhattan(n_poses=100, seed=9)
        b = datasets.manhattan(n_poses=100, seed=9)
        assert np.array_equal(a["measurements"], b["measurements"])
