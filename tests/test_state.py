"""Checkpoint/resume: decoder state snapshots restore byte-exactly."""

import numpy as np

import mpeg_tpu as mpeg


def test_video_checkpoint_resume(mpeg1video_path):
    buf = mpeg.Buffer(open(mpeg1video_path, "rb"))
    buf.set_load_callback(buf.load_reader_callback)
    v = mpeg.Video(buf, backend="numpy")

    for _ in range(10):
        v.decode()
    state = v.get_state()

    ref = [np.asarray(v.decode().flat).copy() for _ in range(5)]
    times = [v.time]

    v.set_state(state)
    got = [np.asarray(v.decode().flat).copy() for _ in range(5)]
    assert times[0] == v.time
    for i, (a, b) in enumerate(zip(ref, got)):
        assert np.array_equal(a, b), f"frame {i} differs after restore"


def test_audio_checkpoint_resume(mp2_path):
    buf = mpeg.Buffer(open(mp2_path, "rb"))
    buf.set_load_callback(buf.load_reader_callback)
    a = mpeg.Audio(buf, backend="numpy")

    for _ in range(10):
        a.decode()
    state = a.get_state()

    ref = [a.decode().interleaved.copy() for _ in range(5)]
    a.set_state(state)
    got = [a.decode().interleaved.copy() for _ in range(5)]
    for i, (x, y) in enumerate(zip(ref, got)):
        assert np.array_equal(x, y), f"audio frame {i} differs"


def test_decode_stats():
    from mpeg_tpu.utils.profiling import DecodeStats
    s = DecodeStats()
    with s.host():
        s.frames += 3
        s.pixels += 3 * 160 * 120
    d = s.summary()
    assert d["frames"] == 3
    assert d["host_seconds"] >= 0
