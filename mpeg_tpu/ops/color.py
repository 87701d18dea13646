"""YCbCr -> RGBA color conversion.

Two paths:

- `ycbcr420_to_rgba`: the exact integer BT.601 conversion used by Go's
  image/color.YCbCrToRGB (which the reference's Frame.RGBA reaches via
  image/draw — video.go:31-36), vectorized over the frame.  Bit-exact
  parity with the reference's RGBA output on any backend.
- `make_ycbcr420_to_rgba_jax`: the jitted device version for fused
  decode->RGB output pipelines.

The fixed-point constants are Go stdlib's (91881/65536 = 1.402 etc.).
"""

from __future__ import annotations

import numpy as np


def ycbcr_to_rgb_int(y, cb, cr, xp):
    """Exact Go image/color.YCbCrToRGB on int32 arrays -> (r, g, b) uint8."""
    yy1 = y.astype(xp.int32) * 0x10101
    cb1 = cb.astype(xp.int32) - 128
    cr1 = cr.astype(xp.int32) - 128

    def squash(c):
        # if uint32(c)&0xff000000 == 0 { c >>= 16 } else { c = ^(c>>31) & 0xffff }
        in_range = (c.astype(xp.uint32) & xp.uint32(0xFF000000)) == 0
        return xp.where(in_range, c >> 16, (~(c >> 31)) & 0xFFFF) \
            .astype(xp.uint8)

    r = squash(yy1 + 91881 * cr1)
    g = squash(yy1 - 22554 * cb1 - 46802 * cr1)
    b = squash(yy1 + 116130 * cb1)
    return r, g, b


def ycbcr420_to_rgba(y_plane, cb_plane, cr_plane, width, height, xp):
    """4:2:0 planes (mb-padded) -> [height, width, 4] RGBA."""
    y = y_plane[:height, :width]
    # 4:2:0 chroma upsample: each chroma sample covers a 2x2 luma block.
    cb = cb_plane[: (height + 1) // 2, : (width + 1) // 2]
    cr = cr_plane[: (height + 1) // 2, : (width + 1) // 2]
    cb = xp.repeat(xp.repeat(cb, 2, axis=0), 2, axis=1)[:height, :width]
    cr = xp.repeat(xp.repeat(cr, 2, axis=0), 2, axis=1)[:height, :width]

    r, g, b = ycbcr_to_rgb_int(y, cb, cr, xp)
    a = xp.full(r.shape, 255, xp.uint8)
    return xp.stack([r, g, b, a], axis=-1)


def make_ycbcr420_to_rgba_jax(width: int, height: int):
    """Jitted device conversion: flat frame views -> RGBA."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def convert(y_plane, cb_plane, cr_plane):
        return ycbcr420_to_rgba(y_plane, cb_plane, cr_plane,
                                width, height, jnp)

    return convert


def flat_frame_to_rgba(flat, geom, xp):
    """Shared-layout flat frame buffer -> [height, width, 4] RGBA."""
    y = flat[:geom.luma_size].reshape(geom.luma_height, geom.luma_width)
    cb0 = geom.luma_size
    cr0 = geom.luma_size + geom.chroma_size
    cb = flat[cb0:cb0 + geom.chroma_size].reshape(
        geom.chroma_height, geom.chroma_width)
    cr = flat[cr0:cr0 + geom.chroma_size].reshape(
        geom.chroma_height, geom.chroma_width)
    return ycbcr420_to_rgba(y, cb, cr, geom.width, geom.height, xp)
