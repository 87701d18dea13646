"""Pallas TPU kernels.

The decode pipeline's XLA formulation already runs at HBM-bandwidth speed
on v5e (sliced-gather MC ≈ 0.02 ms per 1080p plane), so these kernels are
not about beating XLA today — they are the hand-tuned escape hatch for
the ops with real compute structure, kept correct by the same parity
tests as the XLA path:

- `idct_batch_pallas`: the batched integer 8x8 IDCT (all three exact
  variants + per-block select) as a single VMEM-tiled VPU kernel.
  Layout is position-major — [64, TILE]: the 64 coefficient positions
  ride the sublanes and TILE blocks ride the lanes, so every butterfly
  line is one full-width VPU op (Mosaic cannot reshape the lane dim, and
  block-major [TILE, 64] would leave 127/128 lanes idle).

Runs in interpret mode on CPU for tests; compiled on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .video_recon import _pass_full, _pass_sparse

BLOCK_TILE = 512   # blocks per grid step (lane dim, multiple of 128)


def _idct2d_posmajor(x, sparse):
    """2-D IDCT over 64 position slices x[r*8+c] of shape [1, TILE]."""
    col_pass = _pass_sparse if sparse else _pass_full
    ncols = 4 if sparse else 8

    # Column transform: combine rows within each column.
    mid = [None] * 64
    for c in range(ncols):
        rows_in = tuple(x[r * 8 + c] for r in range(8))
        rows_out = col_pass(rows_in, final_shift=False)
        for r in range(8):
            mid[r * 8 + c] = rows_out[r]

    # Row transform: combine columns within each row.
    out = [None] * 64
    for r in range(8):
        cols_in = tuple(mid[r * 8 + c] for c in range(ncols))
        if sparse:
            cols_out = _pass_sparse(cols_in, final_shift=True)
        else:
            cols_out = _pass_full(cols_in, final_shift=True)
        for c in range(8):
            out[r * 8 + c] = cols_out[c]
    return out


def _idct_kernel(coeff_ref, n_ref, out_ref):
    # coeff_ref: [64, TILE] int32 (position-major); n_ref: [1, TILE].
    x = [coeff_ref[i:i + 1, :] for i in range(64)]
    full = _idct2d_posmajor(x, sparse=False)
    sparse = _idct2d_posmajor(x, sparse=True)

    n = n_ref[0:1, :]
    dc = (x[0] + 128) >> 8
    for i in range(64):
        out_ref[i:i + 1, :] = jnp.where(
            n == 1, dc, jnp.where(n < 10, sparse[i], full[i]))


@functools.partial(jax.jit, static_argnames=("interpret",))
def idct_batch_pallas(coeffs, nblocks, interpret: bool = False):
    """Pallas variant of ops.video_recon.idct_batch.

    coeffs: int32 [N, 64]; nblocks: int32 [N]; returns int32 [N, 64].
    N is padded to the tile size internally.
    """
    n_in = coeffs.shape[0]
    n_pad = -n_in % BLOCK_TILE
    total = n_in + n_pad
    coeffs_t = jnp.pad(coeffs, ((0, n_pad), (0, 0))).T   # [64, total]
    n_t = jnp.pad(nblocks, (0, n_pad))[None, :]          # [1, total]

    out = pl.pallas_call(
        _idct_kernel,
        out_shape=jax.ShapeDtypeStruct((64, total), jnp.int32),
        grid=(total // BLOCK_TILE,),
        in_specs=[
            pl.BlockSpec((64, BLOCK_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((64, BLOCK_TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(coeffs_t, n_t)
    return out.T[:n_in]
