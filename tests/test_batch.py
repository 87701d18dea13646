"""Batched scan decoder parity: one-dispatch-per-window must reproduce the
sequential per-picture decode exactly (same 260 frames, same bytes)."""

import numpy as np

import mpeg_tpu as mpeg
from mpeg_tpu.parallel import BatchVideoDecoder
from mpeg_tpu.utils import Fnv1a64

GOLDEN_VIDEO_HASH = 0xEA6D7FCB1340BA3F


def test_batch_scan_matches_golden(mpeg1video_path):
    buf = mpeg.Buffer(open(mpeg1video_path, "rb"))
    buf.set_load_callback(buf.load_reader_callback)
    dec = BatchVideoDecoder(buf, window=16)

    geom = None
    h = Fnv1a64()
    frames = 0
    while True:
        got = dec.decode_window()
        if not got:
            break
        geom = dec.geom
        for flat in got:
            flat = np.asarray(flat)
            h.write(flat[:geom.frame_size].tobytes())
            frames += 1

    assert frames == 260
    assert h.sum64() == GOLDEN_VIDEO_HASH, \
        f"batch hash {h.sum64():#018x} over {frames} frames"
