"""Linear-operator algebra: jit-traceable closures with composition.

TPU-native replacement for deal.II's ``LinearOperator`` layer
(``linear_operator / transpose_operator / inverse_operator / block_operator``,
reference usage e.g. immersed_laplace.cc:511-519, elliptic_interface.cc:816-819).
Operators are lightweight Python objects whose ``__call__`` is traceable; they
compose at trace time, so an entire preconditioned Krylov solve jits into one
XLA computation.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["LinOp", "identity", "zero_op", "diag_op", "block_diag_solve"]


class LinOp:
    """A linear map y = A @ x as a traceable callable with a known shape.

    ``rmv`` (optional) is the transpose action, enabling ``.T``.
    Supports ``A + B``, ``A - B``, ``alpha * A``, ``A @ B`` (composition),
    ``-A`` — mirroring the deal.II operator algebra the reference's
    preconditioners are written in.
    """

    def __init__(self, mv, shape, rmv=None, name: str = ""):
        self._mv = mv
        self._rmv = rmv
        self.shape = tuple(shape)
        self.name = name

    def __call__(self, x):
        return self._mv(x)

    @property
    def T(self) -> "LinOp":
        if self._rmv is None:
            raise ValueError(f"operator {self.name!r} has no transpose action")
        return LinOp(self._rmv, (self.shape[1], self.shape[0]), self._mv,
                     name=f"{self.name}^T")

    def __add__(self, other: "LinOp") -> "LinOp":
        assert self.shape == other.shape, (self.shape, other.shape)
        rmv = None
        if self._rmv is not None and other._rmv is not None:
            rmv = lambda x: self._rmv(x) + other._rmv(x)
        return LinOp(lambda x: self(x) + other(x), self.shape, rmv)

    def __sub__(self, other: "LinOp") -> "LinOp":
        return self + (-1.0) * other

    def __neg__(self) -> "LinOp":
        return (-1.0) * self

    def __rmul__(self, alpha) -> "LinOp":
        rmv = None if self._rmv is None else (lambda x: alpha * self._rmv(x))
        return LinOp(lambda x: alpha * self(x), self.shape, rmv)

    def __matmul__(self, other: "LinOp") -> "LinOp":
        assert self.shape[1] == other.shape[0], (self.shape, other.shape)
        rmv = None
        if self._rmv is not None and other._rmv is not None:
            rmv = lambda x: other._rmv(self._rmv(x))
        return LinOp(lambda x: self(other(x)), (self.shape[0], other.shape[1]), rmv)


def identity(n: int) -> LinOp:
    return LinOp(lambda x: x, (n, n), lambda x: x, name="I")


def zero_op(m: int, n: int) -> LinOp:
    def mv(x):
        return jnp.zeros((m,) + x.shape[1:], dtype=x.dtype)

    def rmv(x):
        return jnp.zeros((n,) + x.shape[1:], dtype=x.dtype)

    return LinOp(mv, (m, n), rmv, name="0")


def diag_op(d) -> LinOp:
    n = d.shape[0]
    return LinOp(lambda x: d * x, (n, n), lambda x: d * x, name="diag")


def block_diag_solve(*ops):
    """Apply a tuple of operators to a tuple of vectors (block-diagonal action)."""

    def apply(blocks):
        return tuple(op(b) for op, b in zip(ops, blocks))

    return apply
