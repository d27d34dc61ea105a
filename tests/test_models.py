"""Unit tests for the dynamics models and kinematic maps.

Oracle values computed independently (numpy float64) from the reference model
equations (``scripts/{diff,omni4,tric}/*_amr_model.py``).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from nmpc_nav_control_tpu.models import diff, omni4, tric
from nmpc_nav_control_tpu.utils import norm_ang_rad, unwrap_angle


def test_diff_dynamics_matches_reference_equations():
    x = np.array([0.3, -0.2, 0.7, 0.4, 0.6, 0.5, 0.7])
    u = np.array([0.1, -0.2])
    dist_b, tau_v = 0.27, 0.1
    p = diff.make_params(dist_b, tau_v)
    v = (x[4] + x[3]) / 2
    expect = np.array(
        [
            v * np.cos(x[2]),
            v * np.sin(x[2]),
            (x[4] - x[3]) / dist_b,
            (x[5] - x[3]) / tau_v,
            (x[6] - x[4]) / tau_v,
            u[0],
            u[1],
        ]
    )
    got = diff.f(jnp.asarray(x), jnp.asarray(u), p)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-12)


def test_diff_kinematics_roundtrip():
    v, w = 0.8, -1.3
    vl, vr = diff.direct_kinematics(v, w, 0.27)
    v2, w2 = diff.inverse_kinematics(vl, vr, 0.27)
    np.testing.assert_allclose([float(v2), float(w2)], [v, w], rtol=1e-12)


def test_omni4_dynamics_matches_reference_equations():
    x = np.array([0.1, 0.2, -0.5, 0.3, -0.4, 0.5, 0.2, 0.1, 0.0, -0.1, 0.3])
    u = np.array([0.1, 0.2, -0.3, 0.4])
    l12, tau_v = 0.535, 0.1
    p = omni4.make_params(l12, tau_v)
    v1, v2, v3, v4 = x[3:7]
    v = (v1 - v2 + v3 - v4) / 4
    vn = (-v1 - v2 + v3 + v4) / 4
    w = -(v1 + v2 + v3 + v4) / (2 * l12)
    ct, st = np.cos(x[2]), np.sin(x[2])
    expect = np.concatenate(
        [
            [v * ct - vn * st, v * st + vn * ct, w],
            (x[7:11] - x[3:7]) / tau_v,
            u,
        ]
    )
    got = omni4.f(jnp.asarray(x), jnp.asarray(u), p)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-12)


def test_omni4_kinematics_roundtrip():
    v, vn, w = 0.6, -0.2, 0.9
    v1, v2, v3, v4 = omni4.direct_kinematics(v, vn, w, 0.535)
    out = omni4.inverse_kinematics(v1, v2, v3, v4, 0.535)
    np.testing.assert_allclose([float(o) for o in out], [v, vn, w], rtol=1e-12)


@pytest.mark.parametrize("bug_compat", [False, True])
def test_tric_dynamics(bug_compat):
    x = np.array([0.3, -0.2, 0.7, 0.8, 0.3, 0.5, 0.2])
    u = np.array([0.1, -0.2])
    dist_d, tau_v, tau_a = 0.27, 0.1, 0.5
    p = tric.make_params(dist_d, tau_v, tau_a)
    # bug_compat reproduces the reference's cos_alpha = sin(alpha) slip
    # (tric_amr_model.py:45); default implements the intended cos(alpha).
    ca = np.sin(x[4]) if bug_compat else np.cos(x[4])
    expect = np.array(
        [
            x[3] * np.cos(x[2]) * ca,
            x[3] * np.sin(x[2]) * ca,
            x[3] / dist_d * np.sin(x[4]),
            (x[5] - x[3]) / tau_v,
            (x[6] - x[4]) / tau_a,
            u[0],
            u[1],
        ]
    )
    fn = tric.f_bug_compat if bug_compat else tric.f
    got = fn(jnp.asarray(x), jnp.asarray(u), p)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-12)


def test_norm_ang_rad_matches_c_semantics():
    for ang, want in [
        (0.0, 0.0),
        (np.pi + 0.1, -np.pi + 0.1),
        (-np.pi - 0.1, np.pi - 0.1),
        (7.0, 7.0 - 2 * np.pi),
        (-7.0, -7.0 + 2 * np.pi),
    ]:
        got = float(norm_ang_rad(jnp.asarray(ang)))
        assert abs(got - want) < 1e-12, (ang, got, want)


def test_unwrap_angle_single_correction():
    # Matches NMPCNavControl.cpp:25-31: one +/- 2pi correction only.
    assert float(unwrap_angle(jnp.asarray(3.0), jnp.asarray(-3.0))) == pytest.approx(
        3.0 - 2 * np.pi
    )
    assert float(unwrap_angle(jnp.asarray(-3.0), jnp.asarray(3.0))) == pytest.approx(
        -3.0 + 2 * np.pi
    )
    # A jump of 3pi is corrected by only one revolution.
    assert float(
        unwrap_angle(jnp.asarray(3 * np.pi + 0.1), jnp.asarray(0.0))
    ) == pytest.approx(np.pi + 0.1)
