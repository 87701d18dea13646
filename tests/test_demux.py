"""Demuxer tests, mirroring mpeg_test.go:24-133."""

import math

import mpeg_tpu as mpeg


def new_demux(path):
    buf = mpeg.Buffer(open(path, "rb"))
    buf.set_load_callback(buf.load_reader_callback)
    return mpeg.Demux(buf)


def test_buffer(mpg_path):
    buf = mpeg.Buffer(open(mpg_path, "rb"))
    buf.set_load_callback(buf.load_reader_callback)
    assert buf.seekable()
    assert buf.size() == 380932


def test_demux(mpg_path):
    demux = new_demux(mpg_path)
    assert demux.probe(5000 * 1024)
    assert demux.has_headers()
    assert demux.get_num_audio_streams() == 1
    assert demux.get_num_video_streams() == 1
    assert int(demux.get_duration(mpeg.PACKET_VIDEO_1)) == 9

    packet = demux.decode()
    assert packet is not None
    assert packet.type == mpeg.PACKET_VIDEO_1


def test_demux_start_time_duration(mpg_path):
    """StartTime/Duration are the lowest/highest PTS per type, independent
    of query order, looking past B-frame reordering
    (mpeg_test.go:87-133)."""
    video_start = 0.810078
    audio_start = 0.810078
    video_dur = 9.233333
    audio_dur = 9.325711
    first_video_pts = 0.876744
    eps = 0.001

    def near(got, want):
        assert math.isclose(got, want, abs_tol=eps), f"{got} vs {want}"

    v_first = new_demux(mpg_path)
    near(v_first.get_start_time(mpeg.PACKET_VIDEO_1), video_start)
    near(v_first.get_duration(mpeg.PACKET_VIDEO_1), video_dur)
    near(v_first.get_start_time(mpeg.PACKET_AUDIO_1), audio_start)
    near(v_first.get_duration(mpeg.PACKET_AUDIO_1), audio_dur)

    a_first = new_demux(mpg_path)
    near(a_first.get_start_time(mpeg.PACKET_AUDIO_1), audio_start)
    near(a_first.get_duration(mpeg.PACKET_AUDIO_1), audio_dur)
    near(a_first.get_start_time(mpeg.PACKET_VIDEO_1), video_start)
    near(a_first.get_duration(mpeg.PACKET_VIDEO_1), video_dur)

    # The start must be the lowest PTS, below the first decoded packet.
    assert new_demux(mpg_path).get_start_time(mpeg.PACKET_VIDEO_1) \
        < first_video_pts
