"""Block-vector layout: deal.II ``BlockVector`` as a flat concatenated array.

Krylov solvers operate on flat arrays (one contiguous buffer per vector — the
TPU-friendly layout); block structure is a static index map applied inside
traced code.  ``split``/``concat`` are zero-copy slicing under XLA fusion.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

__all__ = ["BlockLayout", "block_operator"]


@dataclass(frozen=True)
class BlockLayout:
    sizes: tuple

    @property
    def offsets(self) -> tuple:
        return tuple(np.cumsum([0] + list(self.sizes)))

    @property
    def total(self) -> int:
        return int(sum(self.sizes))

    @property
    def n_blocks(self) -> int:
        return len(self.sizes)

    def split(self, x):
        offs = self.offsets
        return tuple(x[offs[i]:offs[i + 1]] for i in range(self.n_blocks))

    def concat(self, blocks):
        return jnp.concatenate(list(blocks), axis=0)


def block_operator(layout_rows: BlockLayout, layout_cols: BlockLayout, blocks):
    """Assemble a traceable block operator from an n x m grid of LinOps/None
    (None = zero block) — deal.II ``block_operator<n,m>``
    (immersed_laplace.cc:891-892, elliptic_interface.cc:816-819)."""

    def mv(x):
        xs = layout_cols.split(x)
        out = []
        for i in range(layout_rows.n_blocks):
            acc = jnp.zeros(layout_rows.sizes[i], dtype=x.dtype)
            for j in range(layout_cols.n_blocks):
                op = blocks[i][j]
                if op is not None:
                    acc = acc + op(xs[j])
            out.append(acc)
        return layout_rows.concat(out)

    from .linop import LinOp

    return LinOp(mv, (layout_rows.total, layout_cols.total))
