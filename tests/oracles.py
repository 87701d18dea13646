"""Scalar reference oracles for kernel parity tests.

Straight per-pixel/per-coefficient ports of the reference's scalar
semantics (video.go idct, video_noasm.go copyMacroblock), deliberately
structured as naive loops — independent of the vectorized implementations
they check.
"""

import numpy as np


def idct_scalar(block, max_index):
    """Integer 8x8 IDCT, exact port of video.go:801-928 semantics."""
    block = list(block)

    if max_index < 10:
        for i in range(4):
            b1 = 0
            b3 = block[2 * 8 + i]
            b4 = 0 - block[3 * 8 + i]
            tmp1 = block[1 * 8 + i]
            tmp2 = block[3 * 8 + i]
            b6 = block[1 * 8 + i]
            b7 = tmp1 + tmp2
            m0 = block[0 * 8 + i]
            x4 = ((b6 * 473 - b4 * 196 + 128) >> 8) - b7
            x0 = x4 - (((tmp1 - tmp2) * 362 + 128) >> 8)
            x1 = m0 - b1
            x2 = (((block[2 * 8 + i]) * 362 + 128) >> 8) - b3
            x3 = m0 + b1
            y3 = x1 + x2
            y4 = x3 + b3
            y5 = x1 - x2
            y6 = x3 - b3
            y7 = -x0 - ((b4 * 473 + b6 * 196 + 128) >> 8)
            block[0 * 8 + i] = b7 + y4
            block[1 * 8 + i] = x4 + y3
            block[2 * 8 + i] = y5 - x0
            block[3 * 8 + i] = y6 - y7
            block[4 * 8 + i] = y6 + y7
            block[5 * 8 + i] = x0 + y5
            block[6 * 8 + i] = y3 - x4
            block[7 * 8 + i] = y4 - b7

        for i in range(0, 64, 8):
            b1 = 0
            b3 = block[2 + i]
            b4 = 0 - block[3 + i]
            tmp1 = block[1 + i]
            tmp2 = block[3 + i]
            b6 = block[1 + i]
            b7 = tmp1 + tmp2
            m0 = block[0 + i]
            x4 = ((b6 * 473 - b4 * 196 + 128) >> 8) - b7
            x0 = x4 - (((tmp1 - tmp2) * 362 + 128) >> 8)
            x1 = m0 - b1
            x2 = (((block[2 + i]) * 362 + 128) >> 8) - b3
            x3 = m0 + b1
            y3 = x1 + x2
            y4 = x3 + b3
            y5 = x1 - x2
            y6 = x3 - b3
            y7 = -x0 - ((b4 * 473 + b6 * 196 + 128) >> 8)
            block[0 + i] = (b7 + y4 + 128) >> 8
            block[1 + i] = (x4 + y3 + 128) >> 8
            block[2 + i] = (y5 - x0 + 128) >> 8
            block[3 + i] = (y6 - y7 + 128) >> 8
            block[4 + i] = (y6 + y7 + 128) >> 8
            block[5 + i] = (x0 + y5 + 128) >> 8
            block[6 + i] = (y3 - x4 + 128) >> 8
            block[7 + i] = (y4 - b7 + 128) >> 8
    else:
        for i in range(8):
            b1 = block[4 * 8 + i]
            b3 = block[2 * 8 + i] + block[6 * 8 + i]
            b4 = block[5 * 8 + i] - block[3 * 8 + i]
            tmp1 = block[1 * 8 + i] + block[7 * 8 + i]
            tmp2 = block[3 * 8 + i] + block[5 * 8 + i]
            b6 = block[1 * 8 + i] - block[7 * 8 + i]
            b7 = tmp1 + tmp2
            m0 = block[0 * 8 + i]
            x4 = ((b6 * 473 - b4 * 196 + 128) >> 8) - b7
            x0 = x4 - (((tmp1 - tmp2) * 362 + 128) >> 8)
            x1 = m0 - b1
            x2 = (((block[2 * 8 + i] - block[6 * 8 + i]) * 362 + 128) >> 8) - b3
            x3 = m0 + b1
            y3 = x1 + x2
            y4 = x3 + b3
            y5 = x1 - x2
            y6 = x3 - b3
            y7 = -x0 - ((b4 * 473 + b6 * 196 + 128) >> 8)
            block[0 * 8 + i] = b7 + y4
            block[1 * 8 + i] = x4 + y3
            block[2 * 8 + i] = y5 - x0
            block[3 * 8 + i] = y6 - y7
            block[4 * 8 + i] = y6 + y7
            block[5 * 8 + i] = x0 + y5
            block[6 * 8 + i] = y3 - x4
            block[7 * 8 + i] = y4 - b7

        for i in range(0, 64, 8):
            b1 = block[4 + i]
            b3 = block[2 + i] + block[6 + i]
            b4 = block[5 + i] - block[3 + i]
            tmp1 = block[1 + i] + block[7 + i]
            tmp2 = block[3 + i] + block[5 + i]
            b6 = block[1 + i] - block[7 + i]
            b7 = tmp1 + tmp2
            m0 = block[0 + i]
            x4 = ((b6 * 473 - b4 * 196 + 128) >> 8) - b7
            x0 = x4 - (((tmp1 - tmp2) * 362 + 128) >> 8)
            x1 = m0 - b1
            x2 = (((block[2 + i] - block[6 + i]) * 362 + 128) >> 8) - b3
            x3 = m0 + b1
            y3 = x1 + x2
            y4 = x3 + b3
            y5 = x1 - x2
            y6 = x3 - b3
            y7 = -x0 - ((b4 * 473 + b6 * 196 + 128) >> 8)
            block[0 + i] = (b7 + y4 + 128) >> 8
            block[1 + i] = (x4 + y3 + 128) >> 8
            block[2 + i] = (y5 - x0 + 128) >> 8
            block[3 + i] = (y6 - y7 + 128) >> 8
            block[4 + i] = (y6 + y7 + 128) >> 8
            block[5 + i] = (x0 + y5 + 128) >> 8
            block[6 + i] = (y3 - x4 + 128) >> 8
            block[7 + i] = (y4 - b7 + 128) >> 8

    return np.array(block, np.int32)


def copy_macroblock_scalar(motion_h, motion_v, mb_row, mb_col,
                           luma_width, chroma_width, src_flat, dst_flat,
                           luma_size, chroma_size):
    """Scalar motion compensation over flat frame buffers.

    Port of video_noasm.go:28-80 semantics: per plane, 4 interpolation
    modes with MPEG rounding; chroma motion = luma motion / 2 truncated
    toward zero; reads may overrun the plane into the shared buffer.
    """
    def copy_block(base, stride, si, di, size, odd_h, odd_v):
        for r in range(size):
            for x in range(size):
                a = int(src_flat[base + si + r * stride + x])
                if odd_h and not odd_v:
                    b = int(src_flat[base + si + r * stride + x + 1])
                    val = (a + b + 1) >> 1
                elif odd_v and not odd_h:
                    b = int(src_flat[base + si + (r + 1) * stride + x])
                    val = (a + b + 1) >> 1
                elif odd_h and odd_v:
                    b = int(src_flat[base + si + r * stride + x + 1])
                    c = int(src_flat[base + si + (r + 1) * stride + x])
                    d = int(src_flat[base + si + (r + 1) * stride + x + 1])
                    val = (a + b + c + d + 2) >> 2
                else:
                    val = a
                dst_flat[base + di + r * stride + x] = val

    hp = motion_h >> 1
    vp = motion_v >> 1
    lsi = ((mb_row << 4) + vp) * luma_width + (mb_col << 4) + hp
    ldi = (mb_row << 4) * luma_width + (mb_col << 4)
    copy_block(0, luma_width, lsi, ldi, 16,
               motion_h & 1 == 1, motion_v & 1 == 1)

    cm_h = int(motion_h / 2) if motion_h >= 0 else -((-motion_h) // 2)
    cm_v = int(motion_v / 2) if motion_v >= 0 else -((-motion_v) // 2)
    hp = cm_h >> 1
    vp = cm_v >> 1
    csi = ((mb_row << 3) + vp) * chroma_width + (mb_col << 3) + hp
    cdi = (mb_row << 3) * chroma_width + (mb_col << 3)
    copy_block(luma_size, chroma_width, csi, cdi, 8,
               cm_h & 1 == 1, cm_v & 1 == 1)
    copy_block(luma_size + chroma_size, chroma_width, csi, cdi, 8,
               cm_h & 1 == 1, cm_v & 1 == 1)
