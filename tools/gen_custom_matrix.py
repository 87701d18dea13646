"""Custom quant-matrix MPEG-1 video ES synthesis.

No MPEG-1 encoder in this environment emits custom quantiser matrices
(libavcodec-via-cv2 always writes the defaults), so the coverage stream
for the load_intra/load_non_intra branches (video.py:483-492;
/root/reference/video.go:303-316) is produced by splicing matrices into
an existing ES: a sequence header with both load bits clear is exactly
64 bits, so setting both bits and inserting the two 64-byte zig-zag
matrices keeps everything byte-aligned — no downstream re-packing.
"""

from __future__ import annotations

from mpeg_tpu.tables import ZIG_ZAG

from gen_mp2 import BitWriter   # sibling tool (same bit conventions)

# Deterministic non-default matrices (values 1..255, natural order).
CUSTOM_INTRA = tuple(((8 + 3 * i) % 254) + 1 for i in range(64))
CUSTOM_NON_INTRA = tuple(((16 + 5 * i) % 254) + 1 for i in range(64))


def splice_custom_matrices(es: bytes,
                           intra=CUSTOM_INTRA,
                           non_intra=CUSTOM_NON_INTRA) -> bytes:
    """Return `es` with every sequence header rewritten to load the
    given custom intra/non-intra quantiser matrices."""
    out = bytearray()
    pos = 0
    spliced = 0
    while True:
        i = es.find(b"\x00\x00\x01\xB3", pos)
        if i < 0:
            out += es[pos:]
            break
        hdr_start = i + 4
        # 62 fixed bits: width(12) height(12) aspect(4) framerate(4)
        # bitrate(18) marker(1) vbv(10) constrained(1); then the two
        # load flags.  Require both flags clear (8-byte header).
        hdr = es[hdr_start:hdr_start + 8]
        if len(hdr) < 8:
            out += es[pos:]
            break
        load_intra = (hdr[7] >> 1) & 1
        load_non_intra = hdr[7] & 1
        if load_intra or load_non_intra:
            raise ValueError("sequence header already loads matrices")
        out += es[pos:hdr_start]
        out += hdr[:7]
        # Rewrite the tail from the 6 remaining fixed bits: both load
        # flags set + the two matrices in zig-zag stream order
        # (6 + 1 + 512 + 1 + 512 = 1032 bits, exactly 129 bytes).
        bw = BitWriter()
        bw.write(hdr[7] >> 2, 6)  # the 6 fixed bits of byte 7
        bw.write(1, 1)            # load_intra_quantiser_matrix
        for j in range(64):       # stream order: value for ZIG_ZAG[j]
            bw.write(intra[ZIG_ZAG[j]], 8)
        bw.write(1, 1)            # load_non_intra_quantiser_matrix
        for j in range(64):
            bw.write(non_intra[ZIG_ZAG[j]], 8)
        out += bw.tobytes()
        pos = hdr_start + 8
        spliced += 1
    if not spliced:
        raise ValueError("no sequence header found")
    return bytes(out)
