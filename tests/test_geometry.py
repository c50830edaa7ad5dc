"""Unit tests: geometry types and the JAX quaternion core."""

import numpy as np
import pytest

import jax.numpy as jnp

from pycolmap_tpu.geometry import Rigid3d, Rotation3d, Sim3d
from pycolmap_tpu.ops import quaternion as quat_ops


def random_rotation(rng):
    return Rotation3d(rng.standard_normal(3))


class TestRotation3d:
    def test_identity(self):
        r = Rotation3d()
        assert np.allclose(r.quat, [0, 0, 0, 1])
        assert np.allclose(r.matrix(), np.eye(3))

    def test_matrix_roundtrip(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            r = random_rotation(rng)
            r2 = Rotation3d(r.matrix())
            assert min(
                np.abs(r.quat - r2.quat).max(), np.abs(r.quat + r2.quat).max()
            ) < 1e-9

    def test_compose_inverse(self):
        rng = np.random.default_rng(1)
        a, b = random_rotation(rng), random_rotation(rng)
        pt = rng.standard_normal(3)
        assert np.allclose((a * b) * pt, a * (b * pt))
        assert np.allclose(a.inverse() * (a * pt), pt)

    def test_angle(self):
        aa = np.array([0.0, 0.0, 0.5])
        assert np.isclose(Rotation3d(aa).angle(), 0.5)

    def test_batched_points(self):
        rng = np.random.default_rng(2)
        r = random_rotation(rng)
        pts = rng.standard_normal((10, 3))
        out = r * pts
        for i in range(10):
            assert np.allclose(out[i], r * pts[i])


class TestRigid3d:
    def test_inverse_compose(self):
        rng = np.random.default_rng(3)
        t = Rigid3d(random_rotation(rng), rng.standard_normal(3))
        pt = rng.standard_normal(3)
        assert np.allclose(t.inverse() * (t * pt), pt)
        assert np.allclose((t * t.inverse()).matrix(), Rigid3d().matrix(), atol=1e-12)

    def test_matrix_constructor(self):
        rng = np.random.default_rng(4)
        t = Rigid3d(random_rotation(rng), rng.standard_normal(3))
        t2 = Rigid3d(t.matrix())
        assert np.allclose(t.matrix(), t2.matrix())

    def test_essential_matrix_epipolar(self):
        rng = np.random.default_rng(5)
        cam2_from_cam1 = Rigid3d(random_rotation(rng), rng.standard_normal(3))
        E = cam2_from_cam1.essential_matrix()
        X = rng.standard_normal(3) + np.array([0, 0, 5.0])
        x1 = X[:2] / X[2]
        p2 = cam2_from_cam1 * X
        x2 = p2[:2] / p2[2]
        val = np.append(x2, 1.0) @ E @ np.append(x1, 1.0)
        assert abs(val) < 1e-10

    def test_interpolate(self):
        rng = np.random.default_rng(6)
        a = Rigid3d(random_rotation(rng), rng.standard_normal(3))
        b = Rigid3d(random_rotation(rng), rng.standard_normal(3))
        mid = Rigid3d.interpolate(a, b, 0.0)
        assert np.allclose(mid.matrix(), a.matrix(), atol=1e-9)
        mid = Rigid3d.interpolate(a, b, 1.0)
        assert np.allclose(mid.matrix(), b.matrix(), atol=1e-9)


class TestSim3d:
    def test_inverse(self):
        rng = np.random.default_rng(7)
        s = Sim3d(1.7, random_rotation(rng), rng.standard_normal(3))
        pt = rng.standard_normal(3)
        assert np.allclose(s.inverse() * (s * pt), pt)

    def test_matrix_roundtrip(self):
        rng = np.random.default_rng(8)
        s = Sim3d(0.5, random_rotation(rng), rng.standard_normal(3))
        s2 = Sim3d.from_matrix(s.matrix())
        assert np.allclose(s.matrix(), s2.matrix())

    def test_transform_camera_world(self):
        rng = np.random.default_rng(9)
        cam_from_world = Rigid3d(random_rotation(rng), rng.standard_normal(3))
        s = Sim3d(2.5, random_rotation(rng), rng.standard_normal(3))
        X = rng.standard_normal(3)
        new_cam = s.transform_camera_world(cam_from_world)
        a = cam_from_world * X
        b = new_cam * (s * X)
        # projective directions agree; depth scales by s.scale
        assert np.allclose(b / np.linalg.norm(b), a / np.linalg.norm(a))
        assert np.isclose(np.linalg.norm(b) / np.linalg.norm(a), s.scale)


class TestQuatOps:
    def test_matches_host_types(self):
        rng = np.random.default_rng(10)
        r = random_rotation(rng)
        q_wxyz = jnp.array(
            [r.quat[3], r.quat[0], r.quat[1], r.quat[2]], dtype=jnp.float32
        )
        assert np.allclose(
            np.array(quat_ops.quat_to_matrix(q_wxyz)), r.matrix(), atol=1e-6
        )
        v = rng.standard_normal(3).astype(np.float32)
        assert np.allclose(
            np.array(quat_ops.quat_rotate(q_wxyz, jnp.array(v))), r * v, atol=1e-5
        )

    def test_matrix_to_quat_batched(self):
        rng = np.random.default_rng(11)
        Rs = np.stack([random_rotation(rng).matrix() for _ in range(16)])
        qs = np.array(quat_ops.matrix_to_quat(jnp.array(Rs, dtype=jnp.float32)))
        Rs2 = np.array(quat_ops.quat_to_matrix(jnp.array(qs)))
        assert np.abs(Rs - Rs2).max() < 1e-5

    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(12)
        aa = rng.uniform(-1, 1, (8, 3)).astype(np.float32)
        q = quat_ops.axis_angle_to_quat(jnp.array(aa))
        aa2 = np.array(quat_ops.quat_to_axis_angle(q))
        assert np.abs(aa - aa2).max() < 1e-5

    def test_boxplus_small_step(self):
        rng = np.random.default_rng(13)
        r = random_rotation(rng)
        q = jnp.array([r.quat[3], r.quat[0], r.quat[1], r.quat[2]])
        q2 = quat_ops.quat_boxplus(q, jnp.zeros(3))
        assert np.abs(np.array(q2) - np.array(q)).max() < 1e-6

    def test_rigid_compose_inverse(self):
        rng = np.random.default_rng(14)
        r = random_rotation(rng)
        q = jnp.array([r.quat[3], r.quat[0], r.quat[1], r.quat[2]], dtype=jnp.float32)
        t = jnp.array(rng.standard_normal(3), dtype=jnp.float32)
        qi, ti = quat_ops.rigid_inverse(q, t)
        qc, tc = quat_ops.rigid_compose(q, t, qi, ti)
        assert np.abs(np.array(tc)).max() < 1e-5
        assert np.abs(np.abs(np.array(qc)[0]) - 1).max() < 1e-5
