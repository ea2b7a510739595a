import numpy as np
import pytest

from yag_slam_tpu.core.transform import (
    Transform,
    se2_apply,
    se2_compose,
    se2_inverse,
    se2_relative,
    se2_wrap,
)


def random_transforms(n, seed=0):
    rng = np.random.default_rng(seed)
    return [
        Transform.from_xyt(*rng.uniform(-10, 10, 2), rng.uniform(-np.pi, np.pi))
        for _ in range(n)
    ]


def test_compose_identity():
    t = Transform.from_xyt(1.5, -2.0, 0.7)
    i = Transform()
    for r in (t + i, i + t):
        assert np.allclose([r.x, r.y, r.euler[-1]], [1.5, -2.0, 0.7])


def test_sub_is_relative():
    # b + (a - b) == a  — the dead-reckoning identity GraphSlam relies on
    # (/root/reference/yag_slam/graph_slam.py:320-324).
    for a, b in zip(random_transforms(10, 1), random_transforms(10, 2)):
        r = b + (a - b)
        assert np.allclose([r.x, r.y, r.z], [a.x, a.y, a.z], atol=1e-12)
        assert np.allclose(r.euler, a.euler, atol=1e-12)


def test_inverse():
    for a in random_transforms(10, 3):
        r = a + a.inverse()
        assert np.allclose([r.x, r.y, r.z], 0, atol=1e-12)
        assert np.allclose(r.euler, 0, atol=1e-12)


def test_euler_roundtrip():
    t = Transform.from_position_euler(0, 0, 0, 0.1, -0.2, 0.3)
    assert np.allclose(t.euler, (0.1, -0.2, 0.3), atol=1e-12)


def test_from_pose2d_and_serde_layout():
    from yag_slam_tpu.core.transform import Pose2

    t = Transform.from_pose2d(Pose2(1.0, 2.0, 0.5))
    assert np.allclose([t.x, t.y, t.yaw], [1.0, 2.0, 0.5])
    # serde layout: x, y, z, qx, qy, qz, qw (reference serde.py:94)
    t2 = Transform(t.x, t.y, t.z, *t.quaternion)
    assert t2 == t


def test_se2_matches_transform_algebra():
    rng = np.random.default_rng(4)
    for _ in range(20):
        a_xyt = rng.uniform(-5, 5, 3)
        b_xyt = rng.uniform(-5, 5, 3)
        a = Transform.from_xyt(*a_xyt)
        b = Transform.from_xyt(*b_xyt)
        comp = se2_compose(a_xyt, b_xyt)
        ref = a + b
        assert np.allclose(comp, [ref.x, ref.y, se2_wrap(ref.euler[-1])], atol=1e-12)
        rel = se2_relative(a_xyt, b_xyt)
        ref2 = a - b
        assert np.allclose(rel, [ref2.x, ref2.y, se2_wrap(ref2.euler[-1])], atol=1e-12)
        inv = se2_inverse(a_xyt)
        ref3 = a.inverse()
        assert np.allclose(inv, [ref3.x, ref3.y, se2_wrap(ref3.euler[-1])], atol=1e-12)


def test_se2_apply():
    pose = np.array([1.0, 2.0, np.pi / 2])
    x, y = se2_apply(pose, np.array([1.0]), np.array([0.0]))
    assert np.allclose([x[0], y[0]], [1.0, 3.0], atol=1e-12)


def test_se2_batched():
    rng = np.random.default_rng(5)
    a = rng.uniform(-3, 3, (7, 3))
    b = rng.uniform(-3, 3, (7, 3))
    batched = se2_compose(a, b)
    for i in range(7):
        assert np.allclose(batched[i], se2_compose(a[i], b[i]))


def test_algebra_identities_fuzz():
    """Group-identity fuzz over random poses: a + (b - a) == b,
    a + a.inverse() == identity, and the se2 array ops agree with the
    quaternion-backed Transform throughout — including poses far from
    the origin and yaws near the +/-pi wrap."""
    rng = np.random.default_rng(41)
    for _ in range(50):
        ax, ay = rng.normal(0, 100, 2)
        bx, by = rng.normal(0, 100, 2)
        at = rng.uniform(-np.pi, np.pi)
        bt = np.pi - 1e-6 if rng.random() < 0.2 else rng.uniform(-np.pi, np.pi)
        a = Transform.from_xyt(ax, ay, at)
        b = Transform.from_xyt(bx, by, bt)

        # a + (b - a) == b
        c = a + (b - a)
        assert np.allclose([c.x, c.y], [b.x, b.y], atol=1e-9)
        assert abs(se2_wrap(c.euler[-1] - b.euler[-1])) < 1e-9

        # a + a^-1 == identity
        e = a + a.inverse()
        assert np.allclose([e.x, e.y], [0.0, 0.0], atol=1e-9)
        assert abs(se2_wrap(e.euler[-1])) < 1e-9

        # array ops match the Transform algebra
        av = np.array([ax, ay, at])
        bv = np.array([bx, by, bt])
        rel = se2_relative(bv, av)
        d = b - a
        assert np.allclose(rel[:2], [d.x, d.y], atol=1e-9)
        assert abs(se2_wrap(rel[2] - d.euler[-1])) < 1e-9
        comp = se2_compose(av, rel)
        assert np.allclose(comp[:2], [b.x, b.y], atol=1e-9)
        assert abs(se2_wrap(comp[2] - bt)) < 1e-9
