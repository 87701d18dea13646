"""Pallas TPU kernels.

The decode pipeline's XLA formulation already runs at HBM-bandwidth speed
on v5e (sliced-gather MC ≈ 0.02 ms per 1080p plane), so these kernels are
not about beating XLA today — they are the hand-tuned escape hatch for
the ops with real compute structure, kept correct by the same parity
tests as the XLA path, and benched against it (bench.py microbench
section prints the delta; the default decode path keeps whichever wins):

- `idct_batch_pallas`: the batched integer 8x8 IDCT (all three exact
  variants + per-block select) as a single VMEM-tiled VPU kernel.
  Layout is position-major — [64, TILE]: the 64 coefficient positions
  ride the sublanes and TILE blocks ride the lanes, so every butterfly
  line is one full-width VPU op (Mosaic cannot reshape the lane dim, and
  block-major [TILE, 64] would leave 127/128 lanes idle).

- `reconstruct_picture_pallas`: the fused reconstruct — motion
  compensation (window reads + the exact {copy, (a+b+1)>>1,
  (a+c+1)>>1, (a+b+c+d+2)>>2} rounding family, semantics target
  /root/reference/video_amd64.s:91-165), residual add and clamp in ONE
  VMEM pass per plane.  The whole [fwd|bwd] frame stack sits in VMEM
  (uint8; ~6.7 MB for 1080p) and each grid step reconstructs one
  macroblock row, reading its windows with per-pixel-row clamped
  dynamic slices — bit-exact vs the XLA sliced-gather path including
  junk-stream out-of-range motion vectors.

Runs in interpret mode on CPU for tests; compiled on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .video_recon import (
    FrameGeometry, _EXT_COLS, _luma_blocks_to_plane,
    _chroma_blocks_to_plane, _pass_full, _pass_sparse, _trunc_div2,
    idct_batch,
)

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


# --------------------------------------------------------------------------
# Fused plane reconstruction: MC + residual + clamp in one VMEM pass
# --------------------------------------------------------------------------

# Aligned source tile: rows needed = 8-aligned base slack (7) + 16 pixel
# rows + 1 half-pel tap = 24 (3 sublane tiles of 8); when the base clips
# to rows2p - 24, y_min > rows2p - 24 >= base so coverage still holds.
_TILE_ROWS = 24
_TILE_COLS = 256   # 128-aligned base slack (127) + 16 px + 1 tap <= 144


def _make_plane_kernel(bw: int, mb_width: int, rows2: int, rows2p: int):
    """One grid step = one macroblock row of a plane.

    Scalars per MB (scalar-prefetch SMEM, flat [mb]): window row start
    ys0, column start xs (both precomputed in the wrapper with the same
    flat-address arithmetic as video_recon._mc_plane), half-pel flags
    oh/ov, source select sel (0 = keep current plane content).

    Mosaic only allows ALIGNED dynamic vector loads (sublane multiple of
    8, lane multiple of 128), so the per-MB window read is an aligned
    (40, 256) tile followed by exact one-hot row/column selection as two
    f32 matmuls (uint8 values are exact in f32; exactly one term per
    one-hot row is nonzero).  Each pixel row's 2-row window start is
    clamped independently, exactly like the XLA gather's CLIP mode.
    """

    group = 128 // bw          # MBs per 128-lane output tile
    n_groups = mb_width // group   # mb_width pre-padded to a multiple

    def kernel(ys_ref, xs_ref, oh_ref, ov_ref, sel_ref,
               src_ref, cur_ref, res_ref, coded_ref, intra_ref, out_ref):
        row = pl.program_id(0) * mb_width

        def mb_pred(m):
            """Motion-compensate one MB -> (bw, bw) int32 prediction."""
            ys0 = ys_ref[m]
            xs = xs_ref[m]
            oh = oh_ref[m]
            ov = ov_ref[m]

            y_min = jnp.clip(ys0, 0, rows2 - 2)
            base8 = pl.multiple_of(
                jnp.clip((y_min >> 3) << 3, 0, rows2p - _TILE_ROWS), 8)
            xbase = pl.multiple_of((xs >> 7) << 7, 128)
            # uint8 -> int32 -> f32 (Mosaic has no direct u8->f32 cast)
            tile = src_ref[pl.ds(base8, _TILE_ROWS),
                           pl.ds(xbase, _TILE_COLS)] \
                .astype(jnp.int32).astype(jnp.float32)

            # One-hot row selection: t_a[r] = clamped start of pixel row
            # r's 2-row window; the 'c' taps read t_a[r] + 1.
            r_idx = jax.lax.broadcasted_iota(jnp.int32, (bw, _TILE_ROWS), 0)
            k_idx = jax.lax.broadcasted_iota(jnp.int32, (bw, _TILE_ROWS), 1)
            t_a = jnp.clip(ys0 + r_idx, 0, rows2 - 2) - base8
            sel_a = (k_idx == t_a).astype(jnp.float32)
            sel_c = (k_idx == t_a + 1).astype(jnp.float32)
            rows_a = jnp.dot(sel_a, tile,
                             preferred_element_type=jnp.float32)
            rows_c = jnp.dot(sel_c, tile,
                             preferred_element_type=jnp.float32)

            # One-hot column selection: window columns xs..xs+bw.
            cidx = xs - xbase
            kc = jax.lax.broadcasted_iota(
                jnp.int32, (_TILE_COLS, bw + 1), 0)
            jc = jax.lax.broadcasted_iota(
                jnp.int32, (_TILE_COLS, bw + 1), 1)
            sel_col = (kc == cidx + jc).astype(jnp.float32)
            w_a = jnp.dot(rows_a, sel_col,
                          preferred_element_type=jnp.float32) \
                .astype(jnp.int32)                    # (bw, bw+1)
            w_c = jnp.dot(rows_c, sel_col,
                          preferred_element_type=jnp.float32) \
                .astype(jnp.int32)

            sh = oh + ov
            bias = (jnp.int32(1) << sh) >> 1
            hv = oh & ov
            a = w_a[:, :bw]
            b = w_a[:, 1:]
            c = w_c[:, :bw]
            d = w_c[:, 1:]
            return (a + b * oh + c * ov + d * hv + bias) >> sh

        def body(g, _):
            # One 128-lane tile = `group` MBs: per-MB window selection,
            # then a single aligned compose/store.
            m0 = row + g * group
            pred = jnp.concatenate(
                [mb_pred(m0 + u) for u in range(group)], axis=1)
            sel = jnp.concatenate(
                [jnp.full((1, bw), sel_ref[m0 + u], jnp.int32)
                 for u in range(group)], axis=1)     # (1, 128) per-pixel

            col = pl.ds(pl.multiple_of(g * 128, 128), 128)
            cur = cur_ref[:, col].astype(jnp.int32)
            pred = jnp.where(sel > 0, pred, cur)
            base = jnp.where(intra_ref[:, col] > 0, 0, pred)
            out = jnp.where(coded_ref[:, col] > 0,
                            jnp.clip(base + res_ref[:, col], 0, 255), pred)
            out_ref[:, col] = out.astype(jnp.uint8)
            return 0

        jax.lax.fori_loop(0, n_groups, body, 0)

    return kernel


def _mb_window_starts(sel_bwd, hp, vp, base, stride, bw,
                      geom: FrameGeometry, src_len: int):
    """Per-MB window starts (ys0, xs) as [mbh, mbw] int32: same
    flat-address arithmetic as _mc_plane, evaluated once per MB (pixel
    row 0) — row r adds exactly r*stride, so ys increments by one per
    row and xs is row-invariant."""
    mbh, mbw = geom.mb_height, geom.mb_width
    row0 = jnp.arange(mbh, dtype=jnp.int32)[:, None] * bw
    col0 = jnp.arange(mbw, dtype=jnp.int32)[None, :] * bw
    g = lambda a: a.reshape(mbh, mbw)
    off = jnp.where(sel_bwd, src_len // 2, 0).astype(jnp.int32)
    flat0 = (base + (row0 + g(vp)) * stride + col0 + g(hp) + g(off))
    return flat0 // stride, flat0 % stride


def _plane_pallas(src_ext, cur_plane, res_plane, coded_px, intra_px,
                  ys0, xs, oh, ov, sel, mb_rows, bw, mbw,
                  stride, src_len: int, interpret: bool):
    """Run the fused kernel over a plane stack of `mb_rows` MB rows
    (Cb and Cr concatenate into one call — identical strides, different
    bases folded into ys0/xs).  Inputs ys0/xs/oh/ov/sel are [mb_rows,
    mbw]; planes are [mb_rows*bw, mbw*bw].  src_ext is padded so the
    kernel's aligned tile loads are always in bounds: rows to a multiple
    of 8 (>= _TILE_ROWS), columns so the largest 128-aligned lane base +
    _TILE_COLS fits."""
    rows2 = src_len // stride
    rows2p = max(-(-rows2 // 8) * 8, _TILE_ROWS)
    cols_need = ((stride - 1) >> 7 << 7) + _TILE_COLS
    pad_r = rows2p - rows2
    pad_c = max(0, cols_need - src_ext.shape[1])
    if pad_r or pad_c:
        src_ext = jnp.pad(src_ext, ((0, pad_r), (0, pad_c)))

    # Pad the MB grid so every 128-lane output tile is whole (group =
    # 128/bw MBs); padded MBs carry sel=0 and write only padding lanes,
    # sliced off on return.
    group = 128 // bw
    mbwp = -(-mbw // group) * group

    def padmb(a2d):   # (mb_rows, mbw) -> flat [mb_rows*mbwp]
        return jnp.pad(a2d, ((0, 0), (0, mbwp - mbw))).reshape(-1)

    h = mb_rows * bw
    w = mbw * bw
    wp = mbwp * bw

    def padpx(a2d):   # (h, w) -> (h, wp)
        return jnp.pad(a2d, ((0, 0), (0, wp - w)))

    kernel = _make_plane_kernel(bw, mbwp, rows2, rows2p)
    # index_map receives (grid idx, *scalar_prefetch_refs) — ignore refs.
    row_block = lambda: pl.BlockSpec((bw, wp), lambda i, *_: (i, 0),
                                     memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,   # ys0, xs, oh, ov, sel — flat [mb] SMEM
        grid=(mb_rows,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),   # src_ext whole
                  row_block(), row_block(), row_block(), row_block()],
        out_specs=row_block(),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h, wp), jnp.uint8),
        grid_spec=grid_spec,
        interpret=interpret,
    )(padmb(ys0), padmb(xs), padmb(oh), padmb(ov), padmb(sel),
      src_ext, padpx(cur_plane), padpx(res_plane), padpx(coded_px),
      padpx(intra_px))
    return out[:, :w]


@functools.partial(jax.jit, static_argnames=("geom", "interpret",
                                             "pallas_idct"))
def reconstruct_picture_pallas(cur_flat, fwd_flat, bwd_flat,
                               coeffs, nblocks, intra_blk, src_sel,
                               mv_h, mv_v, geom: FrameGeometry,
                               interpret: bool = False,
                               pallas_idct: bool = True):
    """Pallas variant of ops.video_recon.reconstruct_picture: same
    signature/semantics, fused MC+residual+clamp plane kernels."""
    src_stack = jnp.concatenate([fwd_flat, bwd_flat])
    src_len = src_stack.shape[0]
    mb = geom.mb_size

    hp, vp, oh, ov = mv_h >> 1, mv_v >> 1, mv_h & 1, mv_v & 1
    cm_h, cm_v = _trunc_div2(mv_h), _trunc_div2(mv_v)
    chp, cvp, coh, cov = cm_h >> 1, cm_v >> 1, cm_h & 1, cm_v & 1
    sel_bwd = src_sel == 2

    if pallas_idct:
        vals = idct_batch_pallas(coeffs.reshape(-1, 64),
                                 nblocks.reshape(-1),
                                 interpret).reshape(mb, 6, 64)
    else:
        vals = idct_batch(coeffs, nblocks, jnp)
    coded = (nblocks > 0).astype(jnp.int32)

    def ext(stride):
        rows2 = src_len // stride
        s2 = src_stack.reshape(rows2, stride)
        e = jnp.concatenate([s2[1:, :_EXT_COLS],
                             jnp.zeros((1, _EXT_COLS), s2.dtype)])
        return jnp.concatenate([s2, e], axis=1)

    def per_block_luma(a):
        return _luma_blocks_to_plane(
            jnp.broadcast_to(a[:, :, None], (mb, 4, 64)), geom, jnp)

    def per_block_chroma(a):
        return _chroma_blocks_to_plane(
            jnp.broadcast_to(a[:, None], (mb, 64)), geom, jnp)

    cb0 = geom.luma_size
    cr0 = geom.luma_size + geom.chroma_size
    cur_y = cur_flat[:geom.luma_size].reshape(
        geom.luma_height, geom.luma_width)
    cur_cb = cur_flat[cb0:cb0 + geom.chroma_size].reshape(
        geom.chroma_height, geom.chroma_width)
    cur_cr = cur_flat[cr0:cr0 + geom.chroma_size].reshape(
        geom.chroma_height, geom.chroma_width)

    mbh, mbw = geom.mb_height, geom.mb_width
    g = lambda a: a.reshape(mbh, mbw)

    ys_y, xs_y = _mb_window_starts(sel_bwd, hp, vp, 0, geom.luma_width,
                                   16, geom, src_len)
    out_y = _plane_pallas(
        ext(geom.luma_width), cur_y,
        _luma_blocks_to_plane(vals[:, :4], geom, jnp),
        per_block_luma(coded[:, :4]), per_block_luma(intra_blk[:, :4]),
        ys_y, xs_y, g(oh), g(ov), g(src_sel),
        mbh, 16, mbw, geom.luma_width, src_len, interpret)

    # Cb and Cr fuse into ONE kernel invocation: identical strides and
    # motion terms, bases folded into the per-MB window starts, planes
    # stacked along rows.
    ys_cb, xs_cb = _mb_window_starts(sel_bwd, chp, cvp, cb0,
                                     geom.chroma_width, 8, geom, src_len)
    ys_cr, xs_cr = _mb_window_starts(sel_bwd, chp, cvp, cr0,
                                     geom.chroma_width, 8, geom, src_len)
    cat = lambda a, b: jnp.concatenate([a, b], axis=0)
    out_c = _plane_pallas(
        ext(geom.chroma_width), cat(cur_cb, cur_cr),
        cat(_chroma_blocks_to_plane(vals[:, 4], geom, jnp),
            _chroma_blocks_to_plane(vals[:, 5], geom, jnp)),
        cat(per_block_chroma(coded[:, 4]), per_block_chroma(coded[:, 5])),
        cat(per_block_chroma(intra_blk[:, 4]),
            per_block_chroma(intra_blk[:, 5])),
        cat(ys_cb, ys_cr), cat(xs_cb, xs_cr),
        cat(g(coh), g(coh)), cat(g(cov), g(cov)),
        cat(g(src_sel), g(src_sel)),
        2 * mbh, 8, mbw, geom.chroma_width, src_len, interpret)
    out_cb = out_c[:geom.chroma_height]
    out_cr = out_c[geom.chroma_height:]

    pad = cur_flat[geom.frame_size:]
    return jnp.concatenate([
        out_y.reshape(-1), out_cb.reshape(-1), out_cr.reshape(-1), pad])
