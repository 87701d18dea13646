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

- `reconstruct_picture_pallas`: the SINGLE-dispatch fused reconstruct —
  motion compensation (window reads + the exact {copy, (a+b+1)>>1,
  (a+c+1)>>1, (a+b+c+d+2)>>2} rounding family, semantics target
  /root/reference/video_amd64.s:91-165), residual add and clamp for ALL
  THREE planes in ONE pallas_call: a packed row layout (luma rows, then
  Cb|Cr side by side) gives a uniform (8, wp) grid serving both plane
  shapes, and the [fwd|bwd] stack sits whole in VMEM in both stride
  views (same bytes — the full-stack view preserves the junk-MV
  shared-buffer overread parity).  Bit-exact vs the XLA sliced-gather
  path including junk-stream motion vectors.  One custom call per
  picture is also the contention-robust form: in stalled tunnel windows
  the multi-call variant (kept as `reconstruct_picture_pallas_multi`)
  and the many-op XLA path amplify per-op stalls ~50x.

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
def reconstruct_picture_pallas_multi(cur_flat, fwd_flat, bwd_flat,
                                     coeffs, nblocks, intra_blk, src_sel,
                                     mv_h, mv_v, geom: FrameGeometry,
                                     interpret: bool = False,
                                     pallas_idct: bool = True):
    """Multi-call Pallas variant of reconstruct_picture: separate
    luma and fused-chroma plane kernels (2 custom calls, 3 with the
    Pallas IDCT).  Kept for comparison; the default Pallas path is the
    SINGLE-call `reconstruct_picture_pallas` below — on contended
    chips the multi-custom-call form shows larger stall amplification
    (BASELINE.md)."""
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


# --------------------------------------------------------------------------
# Single-dispatch reconstruct: luma + chroma in ONE pallas_call
# --------------------------------------------------------------------------
#
# All three planes reconstruct through one kernel over a PACKED row
# layout (uniform (8, wp) output blocks so one grid serves both plane
# shapes):
#
#   rows [0, mbh*16)        luma plane (two 8-row steps per MB row)
#   rows [mbh*16, mbh*24)   chroma: Cb at lanes [0, 8*mbwp),
#                           Cr at lanes [8*mbwp, 16*mbwp)
#
# Grid = 3*mbh steps: i < 2*mbh -> luma half-row i//2 (+8 rows when
# i odd); else chroma row i - 2*mbh handling Cb and Cr side by side.
# The two source views (full [fwd|bwd] stack at luma stride and at
# chroma stride — the SAME bytes; the full-stack view is what preserves
# the junk-MV shared-buffer overread parity) both sit whole in VMEM.
# The residual/coded/intra inputs arrive pre-packed in the same row
# layout (built by XLA, where the IDCT also runs — fused and bit-exact,
# ops/video_recon.idct_batch), so the Pallas path costs exactly ONE
# custom call per picture vs the previous three.

_U_TILE_ROWS = 16   # 8-aligned slack (7) + 8 pixel rows + 1 tap


def _make_unified_kernel(mbh: int, mbwp: int,
                         rows2_l: int, rows2p_l: int,
                         rows2_c: int, rows2p_c: int):
    wp = 16 * mbwp

    def mb_pred(src_ref, rows2, rows2p, ys0, xs, oh, ov, bw):
        """Motion-compensate one (8, bw) half/block -> int32."""
        y_min = jnp.clip(ys0, 0, rows2 - 2)
        base8 = pl.multiple_of(
            jnp.clip((y_min >> 3) << 3, 0, rows2p - _U_TILE_ROWS), 8)
        xbase = pl.multiple_of((xs >> 7) << 7, 128)
        tile = src_ref[pl.ds(base8, _U_TILE_ROWS),
                       pl.ds(xbase, _TILE_COLS)] \
            .astype(jnp.int32).astype(jnp.float32)

        r_idx = jax.lax.broadcasted_iota(jnp.int32, (8, _U_TILE_ROWS), 0)
        k_idx = jax.lax.broadcasted_iota(jnp.int32, (8, _U_TILE_ROWS), 1)
        t_a = jnp.clip(ys0 + r_idx, 0, rows2 - 2) - base8
        sel_a = (k_idx == t_a).astype(jnp.float32)
        sel_c = (k_idx == t_a + 1).astype(jnp.float32)
        rows_a = jnp.dot(sel_a, tile, preferred_element_type=jnp.float32)
        rows_c = jnp.dot(sel_c, tile, preferred_element_type=jnp.float32)

        cidx = xs - xbase
        kc = jax.lax.broadcasted_iota(jnp.int32, (_TILE_COLS, bw + 1), 0)
        jc = jax.lax.broadcasted_iota(jnp.int32, (_TILE_COLS, bw + 1), 1)
        sel_col = (kc == cidx + jc).astype(jnp.float32)
        w_a = jnp.dot(rows_a, sel_col,
                      preferred_element_type=jnp.float32).astype(jnp.int32)
        w_c = jnp.dot(rows_c, sel_col,
                      preferred_element_type=jnp.float32).astype(jnp.int32)

        sh = oh + ov
        bias = (jnp.int32(1) << sh) >> 1
        hv = oh & ov
        a = w_a[:, :bw]
        b = w_a[:, 1:]
        c = w_c[:, :bw]
        d = w_c[:, 1:]
        return (a + b * oh + c * ov + d * hv + bias) >> sh

    def kernel(ys_l, xs_l, oh_l, ov_l, sel_l,
               ys_c, xs_c, oh_c, ov_c, sel_c,
               srcl_ref, srcc_ref, cur_ref, res_ref, mask_ref, out_ref):
        i = pl.program_id(0)

        def compose(g, pred, sel):
            col = pl.ds(pl.multiple_of(g * 128, 128), 128)
            cur = cur_ref[:, col].astype(jnp.int32)
            # mask int8: bit0 = coded, bit1 = intra (one plane instead of
            # two int32 planes — the HBM traffic was the XLA-path gap)
            m = mask_ref[:, col].astype(jnp.int32)
            pred = jnp.where(sel > 0, pred, cur)
            base = jnp.where((m >> 1) > 0, 0, pred)
            out = jnp.where((m & 1) > 0,
                            jnp.clip(base + res_ref[:, col], 0, 255), pred)
            out_ref[:, col] = out.astype(jnp.uint8)

        @pl.when(i < 2 * mbh)
        def _luma():
            base_slot = i * mbwp

            def body(g, _):
                s0 = base_slot + g * 8
                pred = jnp.concatenate(
                    [mb_pred(srcl_ref, rows2_l, rows2p_l,
                             ys_l[s0 + u], xs_l[s0 + u],
                             oh_l[s0 + u], ov_l[s0 + u], 16)
                     for u in range(8)], axis=1)
                sel = jnp.concatenate(
                    [jnp.full((1, 16), sel_l[s0 + u], jnp.int32)
                     for u in range(8)], axis=1)
                compose(g, pred, sel)
                return 0

            jax.lax.fori_loop(0, mbwp // 8, body, 0)

        @pl.when(i >= 2 * mbh)
        def _chroma():
            base_slot = (i - 2 * mbh) * (2 * mbwp)

            def body(g, _):
                s0 = base_slot + g * 16
                pred = jnp.concatenate(
                    [mb_pred(srcc_ref, rows2_c, rows2p_c,
                             ys_c[s0 + u], xs_c[s0 + u],
                             oh_c[s0 + u], ov_c[s0 + u], 8)
                     for u in range(16)], axis=1)
                sel = jnp.concatenate(
                    [jnp.full((1, 8), sel_c[s0 + u], jnp.int32)
                     for u in range(16)], axis=1)
                compose(g, pred, sel)
                return 0

            jax.lax.fori_loop(0, mbwp // 8, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("geom", "interpret"))
def reconstruct_picture_pallas(cur_flat, fwd_flat, bwd_flat,
                               coeffs, nblocks, intra_blk, src_sel,
                               mv_h, mv_v, geom: FrameGeometry,
                               interpret: bool = False):
    """Pallas variant of ops.video_recon.reconstruct_picture: same
    signature/semantics, ONE custom call for the whole picture
    (fused MC + residual + clamp over all three planes; the IDCT runs
    in XLA where it fuses with the residual packing)."""
    src_stack = jnp.concatenate([fwd_flat, bwd_flat])
    src_len = src_stack.shape[0]
    mb = geom.mb_size
    mbh, mbw = geom.mb_height, geom.mb_width
    mbwp = -(-mbw // 8) * 8
    wp = 16 * mbwp
    lw, cw = geom.luma_width, geom.chroma_width

    hp, vp, oh, ov = mv_h >> 1, mv_v >> 1, mv_h & 1, mv_v & 1
    cm_h, cm_v = _trunc_div2(mv_h), _trunc_div2(mv_v)
    chp, cvp, coh, cov = cm_h >> 1, cm_v >> 1, cm_h & 1, cm_v & 1
    sel_bwd = src_sel == 2

    vals = idct_batch(coeffs, nblocks, jnp)
    coded = (nblocks > 0).astype(jnp.int32)

    def ext(stride):
        rows2 = src_len // stride
        s2 = src_stack.reshape(rows2, stride)
        e = jnp.concatenate([s2[1:, :_EXT_COLS],
                             jnp.zeros((1, _EXT_COLS), s2.dtype)])
        out = jnp.concatenate([s2, e], axis=1)
        rows2p = max(-(-rows2 // 8) * 8, _U_TILE_ROWS)
        cols_need = ((stride - 1) >> 7 << 7) + _TILE_COLS
        pad_r = rows2p - rows2
        pad_c = max(0, cols_need - out.shape[1])
        if pad_r or pad_c:
            out = jnp.pad(out, ((0, pad_r), (0, pad_c)))
        return out, rows2, rows2p

    srcl, rows2_l, rows2p_l = ext(lw)
    srcc, rows2_c, rows2p_c = ext(cw)

    # ---- packed pixel-layout inputs: [mbh*24, wp] ----
    cb0 = geom.luma_size
    cr0 = geom.luma_size + geom.chroma_size

    def pack(luma_plane, cb_plane, cr_plane, dtype):
        """[mbh*24, wp] packed rows: luma, then Cb | Cr side by side
        (Cr lanes start at 8*mbwp — the slot layout the kernel uses)."""
        lu = jnp.pad(luma_plane.astype(dtype),
                     ((0, 0), (0, wp - mbw * 16)))
        zpad = jnp.zeros((mbh * 8, 8 * (mbwp - mbw)), dtype)
        ch = jnp.concatenate(
            [cb_plane.astype(dtype), zpad, cr_plane.astype(dtype), zpad],
            axis=1)
        return jnp.concatenate([lu, ch])

    cur_pack = pack(
        cur_flat[:geom.luma_size].reshape(geom.luma_height, lw),
        cur_flat[cb0:cb0 + geom.chroma_size].reshape(geom.chroma_height,
                                                     cw),
        cur_flat[cr0:cr0 + geom.chroma_size].reshape(geom.chroma_height,
                                                     cw),
        jnp.uint8)
    res_pack = pack(
        _luma_blocks_to_plane(vals[:, :4], geom, jnp),
        _chroma_blocks_to_plane(vals[:, 4], geom, jnp),
        _chroma_blocks_to_plane(vals[:, 5], geom, jnp),
        jnp.int32)

    def per_block_luma(a):
        return _luma_blocks_to_plane(
            jnp.broadcast_to(a[:, :, None], (mb, 4, 64)), geom, jnp)

    def per_block_chroma(a):
        return _chroma_blocks_to_plane(
            jnp.broadcast_to(a[:, None], (mb, 64)), geom, jnp)

    # bit0 = coded, bit1 = intra — one int8 plane for both masks
    cmask = coded + 2 * intra_blk
    mask_pack = pack(per_block_luma(cmask[:, :4]),
                     per_block_chroma(cmask[:, 4]),
                     per_block_chroma(cmask[:, 5]), jnp.int8)

    # ---- per-slot scalars ----
    g2 = lambda a: a.reshape(mbh, mbw)

    def padslots(a2d, slots):
        return jnp.pad(a2d, ((0, 0), (0, slots - a2d.shape[1]))) \
            .reshape(-1).astype(jnp.int32)

    ys_y, xs_y = _mb_window_starts(sel_bwd, hp, vp, 0, lw, 16, geom,
                                   src_len)
    # luma half-steps: step i covers MB row i//2, pixel rows (i%2)*8;
    # flat addressing advances one row per pixel row, so the lower half
    # starts at ys0 + 8.
    def halves(a):   # [mbh, mbw] -> [2*mbh, mbwp] (row pairs)
        return jnp.stack([a, a], axis=1).reshape(2 * mbh, mbw)

    ys_l = padslots(halves(ys_y) +
                    (jnp.arange(2 * mbh, dtype=jnp.int32) % 2)[:, None] * 8,
                    mbwp)
    xs_l = padslots(halves(xs_y), mbwp)
    oh_l = padslots(halves(g2(oh)), mbwp)
    ov_l = padslots(halves(g2(ov)), mbwp)
    sel_l = padslots(halves(g2(src_sel)), mbwp)

    ys_cb, xs_cb = _mb_window_starts(sel_bwd, chp, cvp, cb0, cw, 8, geom,
                                     src_len)
    ys_cr, xs_cr = _mb_window_starts(sel_bwd, chp, cvp, cr0, cw, 8, geom,
                                     src_len)

    def cslots(cb, cr):   # [mbh, mbw] x2 -> [mbh, 2*mbwp] flat
        z = jnp.zeros((mbh, mbwp - mbw), jnp.int32)
        return jnp.concatenate(
            [cb.astype(jnp.int32), z, cr.astype(jnp.int32), z],
            axis=1).reshape(-1)

    ys_c = cslots(ys_cb, ys_cr)
    xs_c = cslots(xs_cb, xs_cr)
    oh_c = cslots(g2(coh), g2(coh))
    ov_c = cslots(g2(cov), g2(cov))
    sel_c = cslots(g2(src_sel), g2(src_sel))

    kernel = _make_unified_kernel(mbh, mbwp, rows2_l, rows2p_l,
                                  rows2_c, rows2p_c)
    row_block = lambda: pl.BlockSpec((8, wp), lambda i, *_: (i, 0),
                                     memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=10,
        grid=(3 * mbh,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),   # srcl whole
                  pl.BlockSpec(memory_space=pltpu.VMEM),   # srcc whole
                  row_block(), row_block(), row_block()],
        out_specs=row_block(),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((mbh * 24, wp), jnp.uint8),
        grid_spec=grid_spec,
        interpret=interpret,
    )(ys_l, xs_l, oh_l, ov_l, sel_l, ys_c, xs_c, oh_c, ov_c, sel_c,
      srcl, srcc, cur_pack, res_pack, mask_pack)

    out_y = out[:mbh * 16, :mbw * 16]
    out_cb = out[mbh * 16:, :mbw * 8]
    out_cr = out[mbh * 16:, 8 * mbwp:8 * mbwp + mbw * 8]
    pad = cur_flat[geom.frame_size:]
    return jnp.concatenate([
        out_y.reshape(-1), out_cb.reshape(-1), out_cr.reshape(-1), pad])
