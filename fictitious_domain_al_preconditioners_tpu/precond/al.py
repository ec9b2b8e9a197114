"""The Augmented-Lagrangian block preconditioners — the repo's contribution.

TPU-native re-implementation of all five preconditioners in the reference's
``augmented_lagrangian_preconditioner.h``:

  - :func:`al_preconditioner`              (C1, lines 14-42, 2x2 DLM systems)
  - :func:`al_preconditioner_stokes`       (C2, lines 44-79, 3x3 (u,p,λ))
  - :func:`al_preconditioner_diagonal`     (C3, lines 81-110, SPD for MinRes)
  - :func:`al_preconditioner_ideal`        (C4, lines 115-164, elliptic ideal)
  - :func:`al_preconditioner_modified`     (C5, lines 168-238, modified AL)

Each is a closure over LinOp actions; applied inside the outer FGMRES/MinRes
``while_loop``, inner inverse actions (themselves CG loops) trace in-place.
"""

from __future__ import annotations

from ..ops.blocks import BlockLayout

__all__ = [
    "al_preconditioner", "al_preconditioner_stokes",
    "al_preconditioner_diagonal", "al_preconditioner_ideal",
    "al_preconditioner_modified",
]


def al_preconditioner(layout: BlockLayout, aug_inv, Ct, inv_w, gamma):
    """2x2 AL right-preconditioner (reference C1, lines 28-34):

        v1 = -γ·W⁻¹ u1
        v0 = Aug⁻¹ (u0 - Cᵀ v1)
    """

    def apply(u):
        u0, u1 = layout.split(u)
        v1 = -gamma * inv_w(u1)
        v0 = aug_inv(u0 - Ct(v1))
        return layout.concat((v0, v1))

    return apply


def al_preconditioner_stokes(layout: BlockLayout, aug_inv, Bt, Ct, inv_w,
                             mp_inv, gamma, gamma_grad_div):
    """3x3 Stokes AL preconditioner over (u, p, λ) (reference C2, lines 62-70):

        v2 = -γ·W⁻¹ u2
        v1 = -γ_gd·Mp⁻¹ u1
        v0 = Aug⁻¹ (u0 - Bᵀ v1 - Cᵀ v2)
    """

    def apply(u):
        u0, u1, u2 = layout.split(u)
        v2 = -gamma * inv_w(u2)
        v1 = -gamma_grad_div * mp_inv(u1)
        v0 = aug_inv(u0 - Bt(v1) - Ct(v2))
        return layout.concat((v0, v1, v2))

    return apply


def al_preconditioner_diagonal(layout: BlockLayout, aug_inv, inv_w, mp_inv,
                               gamma, gamma_grad_div):
    """SPD block-diagonal variant for MinRes (reference C3, lines 95-103):
    ``diag(Aug⁻¹, +γ_gd Mp⁻¹, +γ W⁻¹)`` ('Diagonal SPD preconditioner',
    stokes_immersed_boundary.cc:1056-1064)."""

    def apply(u):
        u0, u1, u2 = layout.split(u)
        return layout.concat((aug_inv(u0),
                              gamma_grad_div * mp_inv(u1),
                              gamma * inv_w(u2)))

    return apply


def al_preconditioner_ideal(layout: BlockLayout, aug_inv_coupled, Ct, M,
                            inv_w, gamma):
    """'Ideal' AL preconditioner for the 3x3 elliptic interface system
    (reference C4, lines 130-156): the (u1,u2) block is inverted *coupled*:

        v2        = -γ·W⁻¹ u2
        [v0, v1]  = Aug⁻¹ [u0 - Cᵀ v2,  u1 + M v2]

    ``aug_inv_coupled`` acts on the concatenated (u0, u1) sub-block.
    """
    sub = BlockLayout(layout.sizes[:2])

    def apply(u):
        u0, u1, u2 = layout.split(u)
        v2 = -gamma * inv_w(u2)
        rhs = sub.concat((u0 - Ct(v2), u1 + M(v2)))
        v01 = aug_inv_coupled(rhs)
        v0, v1 = sub.split(v01)
        return layout.concat((v0, v1, v2))

    return apply


def al_preconditioner_modified(layout: BlockLayout, A11_inv, A22_inv, Ct, M,
                               inv_w, gamma):
    """Modified AL preconditioner — the paper's cheap block-triangular variant
    (reference C5, lines 225-228):

        v2 = -γ·W⁻¹ λ
        v1 = A22⁻¹ (u2 + M v2)
        v0 = A11⁻¹ (u + γ·Cᵀ W⁻¹ M v1 - Cᵀ v2)
    """

    def apply(u):
        u0, u1, u2 = layout.split(u)
        v2 = -gamma * inv_w(u2)
        v1 = A22_inv(u1 + M(v2))
        v0 = A11_inv(u0 + gamma * Ct(inv_w(M(v1))) - Ct(v2))
        return layout.concat((v0, v1, v2))

    return apply
