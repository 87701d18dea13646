"""Multi-stream sharded decode over the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import mpeg_tpu as mpeg
from mpeg_tpu.parallel import sharding as sh
from mpeg_tpu.utils import Fnv1a64

GOLDEN_VIDEO_HASH = 0xEA6D7FCB1340BA3F


def test_sharded_multi_stream_decode(mpeg1video_path):
    import jax
    devices = jax.devices()
    if len(devices) < 2:
        pytest.skip("needs a multi-device mesh")

    n_streams = len(devices)
    window = 8

    # Every device decodes its own copy of the test stream.
    videos = []
    for _ in range(n_streams):
        buf = mpeg.Buffer(open(mpeg1video_path, "rb"))
        buf.set_load_callback(buf.load_reader_callback)
        videos.append(mpeg.Video(buf, backend="plan"))
    assert all(v.has_header() for v in videos)
    geom = videos[0].geom

    mesh = sh.make_mesh(devices)
    decode = sh.make_sharded_scan_decoder(geom, mesh)
    carry = sh.zero_carry(geom, n_streams, mesh)

    hashes = [Fnv1a64() for _ in range(n_streams)]
    counts = [0] * n_streams
    has_ref = [False] * n_streams
    windows = 0

    while windows < 4:   # a few windows are enough for parity
        per_stream = []
        for v in videos:
            plans = []
            while len(plans) < window:
                item = v.parse_next_plan()
                if item is None:
                    break
                plans.append(item)
            per_stream.append(plans)
        if not any(per_stream):
            break

        types = [[t for _, t in p] for p in per_stream]
        stacked = sh.stack_stream_plans(per_stream, geom, window)
        carry, disps, total_px = decode(carry, stacked)
        disps = np.asarray(disps)

        for s in range(n_streams):
            for i, t in enumerate(types[s]):
                if t == 3 or has_ref[s]:
                    hashes[s].write(
                        disps[s, i, :geom.frame_size].tobytes())
                    counts[s] += 1
                else:
                    has_ref[s] = True
        windows += 1
        assert int(total_px) > 0

    # All streams identical input -> identical decode, matching the
    # sequential decoder's prefix.
    seq_buf = mpeg.Buffer(open(mpeg1video_path, "rb"))
    seq_buf.set_load_callback(seq_buf.load_reader_callback)
    seq = mpeg.Video(seq_buf, backend="numpy")
    ref_hash = Fnv1a64()
    for _ in range(counts[0]):
        f = seq.decode()
        ref_hash.write(f.y.tobytes())
        ref_hash.write(f.cb.tobytes())
        ref_hash.write(f.cr.tobytes())

    for s in range(n_streams):
        assert counts[s] == counts[0]
        assert hashes[s].sum64() == ref_hash.sum64(), \
            f"stream {s} diverged"
