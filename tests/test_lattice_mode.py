"""Lattice-resident inner solve (models.immersed_laplace lat_mode +
precond.gmg build_gmg(lattice=True)): exact parity with the flat-vector
composition.

On TPU the flat<->lattice reshape of a (2^r+1)-wide lattice is a real HBM
relayout, so the production inner CG + GMG run on 2D lattice arrays; these
tests pin that the lattice-resident program is ARITHMETICALLY the same
solver (same iterates, same counts), not just an approximation.
"""

import numpy as np
import jax.numpy as jnp

from fictitious_domain_al_preconditioners_tpu.models import (
    ImmersedLaplaceConfig, ImmersedLaplaceProblem,
)
from fictitious_domain_al_preconditioners_tpu.ops.coupling import build_coupling


def _problem(ref=5, solver="augmented"):
    cfg = ImmersedLaplaceConfig(
        initial_refinement=ref,
        initial_embedded_refinement=ref,
        embedded_configuration=("R*cos(2*pi*x)+Cx; R*sin(2*pi*x)+Cy",
                                "R=.2, Cx=.4, Cy=.4"),
        embedding_rhs=("8*pi^2*sin(2*pi*x)*sin(2*pi*y)", ""),
        embedded_value=("sin(2*pi*x)*sin(2*pi*y)", ""),
        solver=solver,
        use_operator_form=True,
        use_diagonal_inverse=True,
    )
    prob = ImmersedLaplaceProblem(cfg)
    prob.setup()
    return prob


def test_patch_al_lattice_matches_masked_flat_apply():
    """patch_al_lattice (free-baked weights, lattice in/out) ==
    m * patch_stencil_al(m * x) on the flat path."""
    prob = _problem()
    gamma = prob.cfg.gamma / prob.curve.h_max
    Cp = build_coupling(prob.space, prob.imm_space, order=3)
    free = np.asarray(prob.free)

    mv2, diag = Cp.patch_al_lattice(prob.space, gamma, free=free)
    AL, diag_flat = Cp.patch_stencil_al(prob.space, gamma)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(prob.space.n_dofs))
    shape = tuple(reversed(prob.space.n_points_1d))

    m = jnp.asarray(free, dtype=x.dtype)
    want = m * AL(m * x)
    got = mv2(x.reshape(shape)).reshape(-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-13)
    # diagonals agree on free dofs (boundary rows are masked in the
    # lattice-baked weights; the flat diag is pre-masking)
    np.testing.assert_allclose(np.asarray(diag * m),
                               np.asarray(diag_flat * m), rtol=1e-12)


def test_lattice_solver_parity_with_flat():
    """The lattice-resident augmented solve returns the same solution and
    iteration count as the flat composition of the same operators."""
    prob = _problem()
    assert prob._lat_mode_ok()
    u_lat, lam_lat, info_lat = prob.solve()

    prob2 = _problem()
    prob2._lat_mode_ok = lambda: False            # force flat composition
    u_flat, lam_flat, info_flat = prob2.solve()

    assert int(info_lat.iterations) == int(info_flat.iterations)
    du = float(jnp.max(jnp.abs(u_lat - u_flat)))
    scale = float(jnp.max(jnp.abs(u_flat)))
    tol = 1e-9 if u_flat.dtype == jnp.float64 else 1e-5
    assert du <= tol * scale, du


def test_padded_lattice_parity(monkeypatch):
    """Padded-lattice mode (lane-aligned physical shapes, FDAL_LAT_PAD=1;
    the production composition above LAT_MAX_FINE on TPU) is ARITHMETICALLY
    the same solver as the exact-shape lattice mode: identical iterates on
    the logical lattice, pad region zero throughout."""
    monkeypatch.setenv("FDAL_LAT_PAD", "1")
    prob = _problem()
    assert prob._lat_phys(prob.space) is not None
    assert prob._lat_mode_ok()
    u_pad, lam_pad, info_pad = prob.solve()

    monkeypatch.setenv("FDAL_LAT_PAD", "0")
    prob2 = _problem()
    assert prob2._lat_phys(prob2.space) is None
    u, lam, info = prob2.solve()

    assert int(info_pad.iterations) == int(info.iterations)
    du = float(jnp.max(jnp.abs(u_pad - u)))
    scale = float(jnp.max(jnp.abs(u)))
    tol = 1e-9 if u.dtype == jnp.float64 else 1e-5
    assert du <= tol * scale, du


def test_padded_lattice_kg_inv_parity(monkeypatch):
    """_kg_inv's padded-lattice build (CG/Elman/rational solver modes)
    agrees with the exact-shape build."""
    monkeypatch.setenv("FDAL_LAT_PAD", "1")
    prob = _problem(solver="CG")
    u_pad, _, info_pad = prob.solve()

    monkeypatch.setenv("FDAL_LAT_PAD", "0")
    prob2 = _problem(solver="CG")
    u, _, info = prob2.solve()

    assert int(info_pad.iterations) == int(info.iterations)
    du = float(jnp.max(jnp.abs(u_pad - u)))
    scale = float(jnp.max(jnp.abs(u)))
    tol = 1e-9 if u.dtype == jnp.float64 else 1e-5
    assert du <= tol * scale, du


def test_lattice_kg_inv_parity_with_flat():
    """_kg_inv (tight GMG-CG inverse used by the CG/Elman/rational modes)
    agrees between the lattice-resident and flat builds."""
    prob = _problem(solver="CG")
    assert prob._lat_mode_ok()
    u_lat, lam_lat, info_lat = prob.solve()

    prob2 = _problem(solver="CG")
    prob2._lat_mode_ok = lambda: False
    u_flat, lam_flat, info_flat = prob2.solve()

    assert int(info_lat.iterations) == int(info_flat.iterations)
    du = float(jnp.max(jnp.abs(u_lat - u_flat)))
    scale = float(jnp.max(jnp.abs(u_flat)))
    tol = 1e-9 if u_flat.dtype == jnp.float64 else 1e-5
    assert du <= tol * scale, du
