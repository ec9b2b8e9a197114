"""Banded lattice applies: sparse lattice-space operators as shift-FMA planes.

Any operator assembled on a continuous ``GridSpace`` couples dofs within a
fixed lattice distance (the FE support width; γ·Cᵀdiag(w)C inherits the
coupling's), so its matrix is a variable-coefficient stencil: per lattice
offset one weight plane on the bounding patch of its rows.  The apply is a
static slice + one fused multiply-add per non-empty offset + one
update-slice — no gather, no scatter.  On TPU this replaces the
latency-bound gather→MXU→scatter element/COO applies inside GMG level
smoothers (the round-4 elliptic:3+ / elasticity cost cliff: coupling applies
at ~3 ms per smoother sweep; the reference feeds its AMG the SAME explicit
diag-weighted matrices, elliptic_interface.cc:821-851 and utilities.h
:111-331 — this is their matrix, applied the TPU way).

Supports any dimension (2D/3D), any continuous degree (the band grows with
the FE support), and component-major vector operators (``n_comp`` blocks,
e.g. the elasticity/Stokes velocity stiffness with cross-component
coupling).
"""

from __future__ import annotations

import numpy as np

from .sparse import COO

__all__ = ["lattice_band_linop"]


def lattice_band_linop(space, coo: COO, *, scale: float = 1.0,
                       max_band: int = 4, n_comp: int = 1,
                       max_planes: int = 512):
    """EXACT banded apply of ``scale * coo`` on a lattice space.

    ``space`` must be a continuous :class:`GridSpace`-like object with
    ``n_points_1d`` (lattice numbering, x fastest); ``coo`` is the
    (``n_comp``·n × ``n_comp``·n) operator in component-major dof order.

    Returns ``(mv_flat: LinOp, mv_lat: ((ny,nx)->(ny,nx)) | None,
    diag: (n_comp·n,) np.ndarray)`` — ``mv_lat`` only for scalar 2D — or
    ``None`` when the space is not a lattice, the band exceeds ``max_band``,
    or the stencil needs more than ``max_planes`` weight planes (callers
    fall back to their generic applies)."""
    if (space is None or not getattr(space, "continuous", False)
            or not hasattr(space, "n_points_1d")):
        return None
    if coo.nnz == 0:
        return None
    import jax
    import jax.numpy as jnp

    from .linop import LinOp

    npts = tuple(int(x) for x in space.n_points_1d)
    d = len(npts)
    lat_shape = tuple(reversed(npts))          # row-major: last axis = x
    n = int(np.prod(npts))
    assert coo.shape == (n_comp * n, n_comp * n)

    comp_i, li = coo.rows // n, coo.rows % n
    comp_j, lj = coo.cols // n, coo.cols % n

    def coords(flat):
        out = []
        rem = flat
        for k in range(d):                      # dim order, x first
            out.append(rem % npts[k])
            rem = rem // npts[k]
        return list(reversed(out))              # lattice-axis order

    ci = coords(li)
    cj = coords(lj)
    offs = [cj[a] - ci[a] for a in range(d)]
    B = [int(np.abs(o).max()) for o in offs]
    if max(B) > max_band:
        return None

    # shared bounding patch of the ROW support, all components
    lo = [int(c.min()) for c in ci]
    hi = [int(c.max()) for c in ci]
    psh = tuple(hi[a] - lo[a] + 1 for a in range(d))
    interior = all(lo[a] >= B[a] and hi[a] <= lat_shape[a] - 1 - B[a]
                   for a in range(d))

    # bin entries into per-(comp_i, comp_j, offset) weight planes
    kdims = tuple(2 * b + 1 for b in B)
    w = np.zeros((n_comp, n_comp) + kdims + psh)
    idx = (comp_i, comp_j) + tuple(offs[a] + B[a] for a in range(d)) + \
        tuple(ci[a] - lo[a] for a in range(d))
    np.add.at(w, idx, scale * coo.vals)

    planes = []     # (comp_i, comp_j, offset tuple, jnp plane)
    for a in range(n_comp):
        for b in range(n_comp):
            for off in np.ndindex(*kdims):
                pl = w[(a, b) + off]
                if np.any(pl):
                    planes.append((a, b, off, jnp.asarray(pl)))
    if len(planes) > max_planes:
        return None

    halo_lo = tuple(lo[a] - B[a] for a in range(d))
    up_shape = tuple(psh[a] + 2 * B[a] for a in range(d))

    def comp_apply(comps):
        """comps: tuple of n_comp lattice arrays -> same."""
        dt = comps[0].dtype
        if interior:
            ups = [jax.lax.dynamic_slice(c, halo_lo, up_shape)
                   for c in comps]
        else:
            pads = tuple((B[a], B[a]) for a in range(d))
            ups = [jax.lax.dynamic_slice(
                jnp.pad(c, pads), tuple(lo[a] for a in range(d)), up_shape)
                for c in comps]
        accs = [None] * n_comp
        for a, b, off, pl in planes:
            term = pl.astype(dt) * jax.lax.dynamic_slice(ups[b], off, psh)
            accs[a] = term if accs[a] is None else accs[a] + term
        outs = []
        for a in range(n_comp):
            o = jnp.zeros(lat_shape, dtype=dt)
            if accs[a] is not None:
                o = jax.lax.dynamic_update_slice(
                    o, accs[a], tuple(lo[k] for k in range(d)))
            outs.append(o)
        return outs

    def mv(u):
        comps = tuple(u.reshape((n_comp,) + lat_shape)[k]
                      for k in range(n_comp))
        return jnp.stack(comp_apply(comps)).reshape(u.shape)

    mv_lat = None
    if n_comp == 1 and d == 2:
        def mv_lat(x2d):             # noqa: F811 — scalar 2D fast boundary
            return comp_apply((x2d,))[0]

    dg = np.zeros((n_comp,) + lat_shape)
    ctr = tuple(B)
    for a in range(n_comp):
        dg[a][tuple(slice(lo[k], hi[k] + 1) for k in range(d))] = \
            w[(a, a) + ctr]
    nn = n_comp * n
    return (LinOp(mv, (nn, nn), mv, name="band_stencil"), mv_lat,
            dg.reshape(-1))
