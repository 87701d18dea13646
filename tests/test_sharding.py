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


def test_sharded_blob_decode_golden(mpeg1video_path):
    """Production transport on the mesh: window-pool blobs sharded over
    8 virtual devices reproduce the full golden hash on every stream."""
    import jax
    from mpeg_tpu.parallel.batch import (
        count_pool_records, pool_bucket,
    )
    from mpeg_tpu.tables import PICTURE_TYPE_B

    devices = jax.devices()
    if len(devices) < 2:
        pytest.skip("needs a multi-device mesh")

    n_streams = len(devices)
    window = 16

    videos = []
    for _ in range(n_streams):
        buf = mpeg.Buffer(open(mpeg1video_path, "rb"))
        buf.set_load_callback(buf.load_reader_callback)
        videos.append(mpeg.Video(buf, backend="plan"))
    assert all(v.has_header() for v in videos)
    geom = videos[0].geom

    # Parse all windows up front to size the pool buckets once.
    all_windows = []
    while True:
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
        all_windows.append(per_stream)
    nm = max(count_pool_records(p)[0]
             for w in all_windows for p in w if p)
    ne = max(count_pool_records(p)[1]
             for w in all_windows for p in w if p)
    km, ke = pool_bucket(nm, 4096), pool_bucket(max(ne, 1), 64)

    mesh = sh.make_mesh(devices)
    decode = sh.make_sharded_blob_decoder(geom, mesh, window, km, ke)
    carry = sh.zero_carry(geom, n_streams, mesh)

    hashes = [Fnv1a64() for _ in range(n_streams)]
    counts = [0] * n_streams
    has_ref = [False] * n_streams
    last_type = [0] * n_streams

    for per_stream in all_windows:
        blobs = sh.stack_stream_blobs(per_stream, geom, window, km, ke)
        carry, disps, total_px = decode(carry, blobs)
        disps = np.asarray(disps)
        assert int(total_px) == sum(
            len(p) for p in per_stream) * geom.frame_size
        for s, plans in enumerate(per_stream):
            for i, (_, t) in enumerate(plans):
                last_type[s] = t
                if t == PICTURE_TYPE_B or has_ref[s]:
                    hashes[s].write(disps[s, i, :geom.frame_size].tobytes())
                    counts[s] += 1
                else:
                    has_ref[s] = True

    # End-of-stream flush: the pending reference frame (carry backward).
    bwd = np.asarray(carry[2])
    for s in range(n_streams):
        if has_ref[s] and last_type[s] != PICTURE_TYPE_B:
            hashes[s].write(bwd[s, :geom.frame_size].tobytes())
            counts[s] += 1

    for s in range(n_streams):
        assert counts[s] == 260
        assert hashes[s].sum64() == GOLDEN_VIDEO_HASH, \
            f"stream {s}: {hashes[s].sum64():#018x}"


def test_sharded_audio_synth_golden(mp2_path):
    """MP2 synthesis on the mesh: every stream's PCM matches the
    single-stream parallel filterbank bit-for-bit."""
    import jax
    from mpeg_tpu import native
    from mpeg_tpu.ops import filterbank

    devices = jax.devices()
    if len(devices) < 2:
        pytest.skip("needs a multi-device mesh")
    if not native.available():
        pytest.skip("native parser unavailable")

    n_streams = len(devices)
    p = native.NativeAudioParser(open(mp2_path, "rb").read())
    frames = []
    while (f := p.parse_next_frame()) is not None:
        frames.append(f)
    frames = frames[:len(frames) - len(frames) % 4]   # 4n whole frames
    samples = np.asarray(frames, np.int32).reshape(-1, 2, 32)

    # Single-stream reference.
    synth1 = filterbank.make_synthesize_parallel_jax()
    u_ref, _ = synth1(samples, np.zeros((15, 2, 64), np.float32))
    pcm_ref = filterbank.finalize_np(np.asarray(u_ref))

    mesh = sh.make_mesh(devices)
    synth = sh.make_sharded_audio_synth(mesh)
    hist = sh.zero_audio_hist(n_streams, mesh)
    stacked = np.broadcast_to(
        samples, (n_streams,) + samples.shape).copy()
    u, hist, total = synth(stacked, hist)
    assert int(total) == n_streams * samples.shape[0] * 32
    u = np.asarray(u)
    for s in range(n_streams):
        np.testing.assert_array_equal(
            filterbank.finalize_np(u[s]), pcm_ref, err_msg=f"stream {s}")
