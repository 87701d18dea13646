"""Corrupt-stream robustness of the PYTHON oracle parsers (the C++ side
gets the same sweep under ASan/UBSan via tools/run_asan.sh).

Reference contract (SURVEY §5 failure-detection row): decoders return
None on short/odd data and are resumable; junk never raises."""

import io

import pytest

import mpeg_tpu as mpeg


def _bitflip(data: bytes, i: int) -> bytes:
    d = bytearray(data)
    step = max(1, len(d) // 17)
    for off in range(step * (i + 1) % len(d), len(d), 7919):
        d[off] ^= 1 << (i % 8)
    return bytes(d)


def _drive_video(data: bytes):
    buf = mpeg.Buffer(io.BytesIO(data))
    buf.set_load_callback(buf.load_reader_callback)
    v = mpeg.Video(buf, backend="plan", parser="python")
    n = 0
    while v.has_header() and v.parse_next_plan() is not None and n < 300:
        n += 1


def _drive_audio(data: bytes):
    buf = mpeg.Buffer(io.BytesIO(data))
    buf.set_load_callback(buf.load_reader_callback)
    a = mpeg.Audio(buf, backend="numpy", parser="python")
    n = 0
    while a.decode() is not None and n < 400:
        n += 1


def _drive_ps(data: bytes):
    try:
        m = mpeg.MPEG(data, backend="numpy",
                      config=mpeg.Config(parser="python"))
    except mpeg.InvalidMpegError:
        return   # rejecting junk outright is fine
    n = 0
    while m.decode_video() is not None and n < 300:
        n += 1
    m.duration()
    m.seek(1.0, True)


@pytest.mark.parametrize("i", range(0, 16, 3))
def test_bitflip_streams_never_raise(i, mpeg1video_path, mp2_path,
                                     mpg_path):
    _drive_video(_bitflip(open(mpeg1video_path, "rb").read(), i))
    _drive_audio(_bitflip(open(mp2_path, "rb").read(), i))
    _drive_ps(_bitflip(open(mpg_path, "rb").read(), i))


@pytest.mark.parametrize("frac", [0.003, 0.01, 0.5])
def test_truncated_streams_never_raise(frac, mpeg1video_path, mp2_path,
                                       mpg_path):
    for path, drive in ((mpeg1video_path, _drive_video),
                        (mp2_path, _drive_audio),
                        (mpg_path, _drive_ps)):
        data = open(path, "rb").read()
        drive(data[:int(len(data) * frac)])
