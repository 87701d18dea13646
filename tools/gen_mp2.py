"""Deterministic MP2 test-stream generator.

No encoder exists in this environment (no ffmpeg/lame/PyAV), so the
stereo / joint-stereo / dual-channel coverage fixtures are synthesized
directly at the bit level: this module is the mirror image of the frame
parser (mpeg_tpu/audio.py:303-454, reference semantics
/root/reference/audio.go:184-351) — it writes exactly the field sequence
the parser reads, with seeded-random but always-valid field values.  The
output is a spec-valid, constant-parameter MP2 elementary stream; the
decoded PCM is locked by golden hashes in tests/test_audio_modes.py and
cross-checked python == native == device.

Every branch the mono fixture cannot reach is exercised here: the
2-channel allocation loop, the joint-stereo bound (all four
mode_extension values), dual-channel routing, 48/32 kHz rates, and
scale-factor-info patterns 0-3 on both channels.
"""

from __future__ import annotations

import numpy as np

from mpeg_tpu import tables as T

MODE_STEREO = 0x0
MODE_JOINT = 0x1
MODE_DUAL = 0x2
MODE_MONO = 0x3


class BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, value: int, count: int) -> None:
        for i in range(count - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def tobytes(self) -> bytes:
        n = len(self.bits)
        pad = (-n) % 8
        arr = np.asarray(self.bits + [0] * pad, np.uint8)
        return np.packbits(arr).tobytes()


def gen_frame(rng, mode: int, bitrate_index: int, samplerate_index: int,
              mode_ext: int = 0, sparsity: float = 0.25) -> bytes:
    """One spec-valid MP2 frame (including header, no CRC), zero-padded
    to the exact frame size the header implies."""
    bw = BitWriter()
    bw.write(0x7FF, 11)        # sync
    bw.write(0x3, 2)           # version: MPEG-1
    bw.write(0x2, 2)           # layer: II
    bw.write(1, 1)             # no CRC
    bw.write(bitrate_index + 1, 4)
    bw.write(samplerate_index, 2)
    padding = 0
    bw.write(padding, 1)
    bw.write(0, 1)             # private
    bw.write(mode, 2)
    bw.write(mode_ext, 2)
    bw.write(0, 4)             # copyright, original, emphasis

    # Frame layout tables (audio.py:424-433 / audio.go:276-289).
    tab1 = 0 if mode == MODE_MONO else 1
    tab2 = T.QUANT_LUT_STEP_1[tab1][bitrate_index]
    tab3 = T.QUANT_LUT_STEP_2[tab2][samplerate_index]
    sblimit = tab3 & 63
    tab3 >>= 6
    if mode == MODE_JOINT:
        bound = (mode_ext + 1) << 2
    else:
        bound = 0 if mode == MODE_MONO else 32
    bound = min(bound, sblimit)
    nch = 1 if mode == MODE_MONO else 2

    alloc = [[None] * 32 for _ in range(2)]

    def write_alloc(sb):
        tab4 = T.QUANT_LUT_STEP_3[tab3][sb]
        nbits = tab4 >> 4
        code = 0
        if rng.random() < sparsity:
            code = int(rng.integers(1, 1 << nbits))
        bw.write(code, nbits)
        qtab = T.QUANT_LUT_STEP_4[tab4 & 15][code]
        return T.QUANT_TAB[qtab - 1] if qtab != 0 else None

    for sb in range(bound):
        alloc[0][sb] = write_alloc(sb)
        alloc[1][sb] = write_alloc(sb)
    for sb in range(bound, sblimit):
        alloc[0][sb] = alloc[1][sb] = write_alloc(sb)

    scfi = [[0] * 32 for _ in range(2)]
    for sb in range(sblimit):
        for ch in range(nch):
            if alloc[ch][sb] is not None:
                scfi[ch][sb] = int(rng.integers(0, 4))
                bw.write(scfi[ch][sb], 2)

    for sb in range(sblimit):
        for ch in range(nch):
            if alloc[ch][sb] is not None:
                n = (3, 2, 1, 2)[scfi[ch][sb]]
                for _ in range(n):
                    bw.write(int(rng.integers(0, 64)), 6)

    for _part in range(3):
        for _granule in range(4):

            def write_samples(ch, sb):
                q = alloc[ch][sb]
                if q is None:
                    return
                _levels, group, bits = q
                n = 1 if group != 0 else 3
                for _ in range(n):
                    bw.write(int(rng.integers(0, 1 << bits)), bits)

            for sb in range(bound):
                write_samples(0, sb)
                write_samples(1, sb)
            for sb in range(bound, sblimit):
                write_samples(0, sb)

    data = bw.tobytes()
    frame_size = (144000 * T.BIT_RATE[bitrate_index]) // \
        T.SAMPLE_RATE[samplerate_index] + padding
    assert len(data) <= frame_size, \
        f"payload {len(data)} > frame {frame_size}; lower sparsity"
    return data + b"\x00" * (frame_size - len(data))


def gen_stream(mode: int, bitrate_index: int, samplerate_index: int,
               mode_ext: int = 0, frames: int = 24, seed: int = 0,
               sparsity: float = 0.25) -> bytes:
    """A constant-parameter multi-frame MP2 elementary stream."""
    rng = np.random.default_rng(seed)
    return b"".join(
        gen_frame(rng, mode, bitrate_index, samplerate_index,
                  mode_ext=mode_ext, sparsity=sparsity)
        for _ in range(frames))
