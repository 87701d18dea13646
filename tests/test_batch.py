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


def test_batch_scan_rgba(mpeg1video_path):
    """Fused device YCbCr->RGB output matches Frame.rgba() byte-for-byte."""
    import io
    from mpeg_tpu.parallel.batch import make_scan_decoder, stack_plans
    import jax.numpy as jnp

    buf = mpeg.Buffer(open(mpeg1video_path, "rb"))
    buf.set_load_callback(buf.load_reader_callback)
    video = mpeg.Video(buf, backend="plan")
    assert video.has_header()
    geom = video.geom

    plans = []
    while len(plans) < 8:
        item = video.parse_next_plan()
        if item is None:
            break
        plans.append(item)

    scan = make_scan_decoder(geom, emit_rgba=True)
    z = jnp.zeros(geom.total_size, jnp.uint8)
    stacked = stack_plans(plans, geom, 8)
    _carry, disps = scan((z, z, z), stacked)
    disps = np.asarray(disps)
    assert disps.shape == (8, geom.height, geom.width, 4)

    # Reference: sequential decoder + host RGBA conversion, same pictures.
    buf2 = mpeg.Buffer(open(mpeg1video_path, "rb"))
    buf2.set_load_callback(buf2.load_reader_callback)
    v2 = mpeg.Video(buf2, backend="numpy", parser="python")
    # First displayed frame corresponds to scan step 1 (B picture) etc.;
    # compare the first decoded display against the matching disp entry.
    f = v2.decode()
    # find matching disp by exact equality against any step
    want = f.rgba()
    matches = [i for i in range(8) if np.array_equal(disps[i], want)]
    assert matches, "no scan RGBA output matches the sequential frame"
