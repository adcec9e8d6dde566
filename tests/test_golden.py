"""Golden fixtures cross-validating oracle AND JAX paths against constants
derived directly from the reference C++ expressions.

The constants below were produced by scripts/derive_golden.py — a literal
float64 transcription of cornerOptimization (ref: src/mapOptmization.h:
1027-1120), surfOptimization (ref :1154-1211) and LMOptimization iteration 0
(ref :1259-1385) evaluated on hand-built inputs, independent of both
tests/oracle.py and the JAX kernels.  The corner/surf accept fixtures are
also hand-checkable in closed form:

  corner: neighbors on the x-axis, query 0.3 m off in +y ->
          ld2 = 0.3, gradient (0,1,0), s = 1-0.9*0.3 = 0.73,
          coeff = (0, 0.73, 0), resid = 0.73*0.3 = 0.219
  surf:   neighbors on the plane z = 0.5 -> n = (0,0,-2), normalized
          (0,0,-1) with pd = 0.5; query (0.6, 0, 0.8) has ||p||^2 = 1 so the
          sqrt(sqrt(.)) divisor is exactly 1: pd2 = -0.3, s = 0.73,
          coeff = (0, 0, -0.73), resid = -0.219

This closes the shared-misreading bug class: if oracle and kernels both
misread e.g. the sqrt(sqrt(||p||^2)) weight, these constants catch it.
"""

import numpy as np
import jax.numpy as jnp

import oracle
from feature_base_pointcloud_registration_tpu.ops.correspondence import (
    corner_correspondence_cand, surf_correspondence_cand)
from feature_base_pointcloud_registration_tpu.ops.solver import GNState, gn_step

# ---------------------------------------------------------------- fixtures
CORNER_NN = np.array([[-0.2, 0, 0], [-0.1, 0, 0], [0, 0, 0],
                      [0.1, 0, 0], [0.2, 0, 0]], np.float64)
CORNER_P0 = np.array([0.05, 0.3, 0.0])
CORNER_COEFF = np.array([0.0, 0.73, 0.0])
CORNER_RESID = 0.219

CORNER_REJ_NN = np.array([[0.1, 0.1, 0], [0.1, -0.1, 0], [-0.1, 0.1, 0],
                          [-0.1, -0.1, 0], [0, 0, 0]], np.float64)
CORNER_REJ_P0 = np.array([0.0, 0.0, 0.3])

SURF_NN = np.array([[0.3, 0, 0.5], [-0.3, 0, 0.5], [0, 0.3, 0.5],
                    [0, -0.3, 0.5], [0.1, 0.1, 0.5]], np.float64)
SURF_P0 = np.array([0.6, 0.0, 0.8])
SURF_COEFF = np.array([0.0, 0.0, -0.73])
SURF_RESID = -0.219

SURF_REJ_NN = SURF_NN.copy()
SURF_REJ_NN[4, 2] = 1.2

GN_POSE = np.array([0.1, -0.05, 0.2, 0.5, -0.3, 0.2])
# scripts/derive_golden.py, seed 12345, N=1000
GN_POSE_NEW = np.array([0.102003131488, -0.049939722601, 0.199983599949,
                        0.500098875246, -0.321361033687, 0.209541941065])
GN_DEG_POSE_NEW = np.array([0.100032704465, -0.050018043496, 0.199914937127,
                            0.499849565544, -0.300353492981, 0.100326924042])


def _gn_inputs():
    rng = np.random.default_rng(12345)
    N = 1000
    pts = rng.uniform(-10.0, 10.0, (N, 3))
    nrm = rng.normal(size=(N, 3))
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    s = rng.uniform(0.5, 1.0, N)
    coeff = s[:, None] * nrm
    resid = s * rng.uniform(-0.5, 0.5, N)
    coeff_z = 0.05 * rng.normal(size=(N, 3))
    coeff_z[:, 2] += 0.8
    resid_z = np.full(N, 0.8 * 0.1)
    return pts, coeff, resid, coeff_z, resid_z


def _d2idx(p0, nn):
    d2 = ((nn - p0) ** 2).sum(1)
    order = np.argsort(d2)
    return d2[order][None, :], order[None, :]


# ----------------------------------------------------------- oracle parity
def test_oracle_corner_matches_reference_constants():
    d2, idx = _d2idx(CORNER_P0, CORNER_NN)
    coeff, resid, mask = oracle.corner_coeffs(CORNER_P0[None], CORNER_NN,
                                              d2, idx)
    assert bool(mask[0])
    np.testing.assert_allclose(coeff[0], CORNER_COEFF, atol=1e-9)
    np.testing.assert_allclose(resid[0], CORNER_RESID, atol=1e-9)

    d2r, idxr = _d2idx(CORNER_REJ_P0, CORNER_REJ_NN)
    _, _, mr = oracle.corner_coeffs(CORNER_REJ_P0[None], CORNER_REJ_NN,
                                    d2r, idxr)
    assert not bool(mr[0])


def test_oracle_surf_matches_reference_constants():
    d2, idx = _d2idx(SURF_P0, SURF_NN)
    coeff, resid, mask = oracle.surf_coeffs(SURF_P0[None], SURF_NN, d2, idx)
    assert bool(mask[0])
    np.testing.assert_allclose(coeff[0], SURF_COEFF, atol=1e-9)
    np.testing.assert_allclose(resid[0], SURF_RESID, atol=1e-9)

    d2r, idxr = _d2idx(SURF_P0, SURF_REJ_NN)
    _, _, mr = oracle.surf_coeffs(SURF_P0[None], SURF_REJ_NN, d2r, idxr)
    assert not bool(mr[0])


def test_oracle_gn_step_matches_reference_constants():
    pts, coeff, resid, coeff_z, resid_z = _gn_inputs()
    state = (np.eye(6), False)
    pose, _, (matP, is_deg) = oracle.lm_step(GN_POSE.copy(), pts, coeff,
                                             resid, 0, state)
    assert not is_deg
    np.testing.assert_allclose(pose, GN_POSE_NEW, atol=1e-9)

    pose2, _, (_, is_deg2) = oracle.lm_step(GN_POSE.copy(), pts, coeff_z,
                                            resid_z, 0, (np.eye(6), False))
    assert is_deg2
    np.testing.assert_allclose(pose2, GN_DEG_POSE_NEW, atol=1e-9)


# -------------------------------------------------------------- JAX parity
def test_jax_corner_matches_reference_constants():
    cand = jnp.asarray(CORNER_NN, jnp.float32)[None]
    coeff, resid, mask = corner_correspondence_cand(
        jnp.asarray(CORNER_P0, jnp.float32)[None], jnp.asarray([True]),
        cand, jnp.ones((1, 5), bool))
    assert bool(mask[0])
    np.testing.assert_allclose(np.array(coeff[0]), CORNER_COEFF, atol=1e-5)
    np.testing.assert_allclose(np.array(resid[0]), CORNER_RESID, atol=1e-5)

    candr = jnp.asarray(CORNER_REJ_NN, jnp.float32)[None]
    _, _, mr = corner_correspondence_cand(
        jnp.asarray(CORNER_REJ_P0, jnp.float32)[None], jnp.asarray([True]),
        candr, jnp.ones((1, 5), bool))
    assert not bool(mr[0])


def test_jax_surf_matches_reference_constants():
    cand = jnp.asarray(SURF_NN, jnp.float32)[None]
    coeff, resid, mask = surf_correspondence_cand(
        jnp.asarray(SURF_P0, jnp.float32)[None], jnp.asarray([True]),
        cand, jnp.ones((1, 5), bool))
    assert bool(mask[0])
    np.testing.assert_allclose(np.array(coeff[0]), SURF_COEFF, atol=1e-5)
    np.testing.assert_allclose(np.array(resid[0]), SURF_RESID, atol=1e-5)

    candr = jnp.asarray(SURF_REJ_NN, jnp.float32)[None]
    _, _, mr = surf_correspondence_cand(
        jnp.asarray(SURF_P0, jnp.float32)[None], jnp.asarray([True]),
        candr, jnp.ones((1, 5), bool))
    assert not bool(mr[0])


def test_jax_gn_step_matches_reference_constants():
    pts, coeff, resid, coeff_z, resid_z = _gn_inputs()
    state0 = GNState(pose6=jnp.asarray(GN_POSE, jnp.float32),
                     matP=jnp.eye(6, dtype=jnp.float32),
                     is_degenerate=jnp.asarray(False),
                     converged=jnp.asarray(False),
                     n_corr=jnp.asarray(0, jnp.int32))
    mask = jnp.ones(len(pts), bool)
    st = gn_step(state0, jnp.asarray(pts, jnp.float32),
                 jnp.asarray(coeff, jnp.float32),
                 jnp.asarray(resid, jnp.float32), mask,
                 jnp.asarray(0, jnp.int32))
    assert not bool(st.is_degenerate)
    np.testing.assert_allclose(np.array(st.pose6), GN_POSE_NEW, atol=5e-4)

    st2 = gn_step(state0, jnp.asarray(pts, jnp.float32),
                  jnp.asarray(coeff_z, jnp.float32),
                  jnp.asarray(resid_z, jnp.float32), mask,
                  jnp.asarray(0, jnp.int32))
    assert bool(st2.is_degenerate)
    np.testing.assert_allclose(np.array(st2.pose6), GN_DEG_POSE_NEW,
                               atol=5e-4)


def test_surf_planar_spread_gate():
    """Opt-in collinearity gate (surf_min_planar_spread): a nearly-collinear
    same-ring-arc 5-NN set passes the reference's plane-validity check (all
    5 pts within 0.2 m of the fit) but carries an arbitrary normal; the
    spread gate (middle singular value of the neighbor scatter) rejects it,
    while a genuine 2-D plane patch survives.  Default 0.0 = gate off =
    reference parity (the golden fixtures above pin that path)."""
    # near-collinear arc ~5 m out (tiny z jitter so the fit is well-posed
    # enough to pass detR, like real same-ring neighbors)
    arc = np.stack([np.full(5, 5.0),
                    np.linspace(-0.4, 0.4, 5),
                    -1.0 + np.array([0.004, -0.003, 0.002, -0.004, 0.001])],
                   -1)
    q_arc = arc.mean(0) + np.array([0.0, 0.0, 0.02])
    # genuine plane patch: spread in x and y, constant z
    patch = np.array([[4.7, -0.3, -1.0], [5.3, -0.3, -1.0], [5.0, 0.0, -1.0],
                      [4.7, 0.3, -1.0], [5.3, 0.3, -1.0]])
    q_patch = np.array([5.0, 0.1, -0.95])

    for nn, q in ((arc, q_arc), (patch, q_patch)):
        cand = jnp.asarray(nn, jnp.float32)[None]
        qj = jnp.asarray(q, jnp.float32)[None]
        _, _, m_off = surf_correspondence_cand(
            qj, jnp.asarray([True]), cand, jnp.ones((1, 5), bool))
        _, _, m_on = surf_correspondence_cand(
            qj, jnp.asarray([True]), cand, jnp.ones((1, 5), bool),
            min_plane_spread=0.05)
        if nn is arc:
            assert bool(m_off[0])       # reference accepts the collinear set
            assert not bool(m_on[0])    # spread gate rejects it
        else:
            assert bool(m_off[0]) and bool(m_on[0])
