"""Tiny MPEG-1 Program Stream muxer (test tooling).

Builds long-form muxed fixtures for the soak tests: interleaves a video
elementary stream and an MP2 elementary stream into MPEG-1 PS packets
with monotonically increasing PTS, looping the inputs to reach a target
duration.  Emits exactly the fields the demuxers parse (pack header
0xBA, system header 0xBB, PES packets with the MPEG-1 PTS marker) —
cross-checked against both the Python and native demuxers by the soak
test itself.

Layout references: pack header demux.go:92-111, system header
demux.go:116-132, PES packet demux.go:531-568.
"""

from __future__ import annotations

import io


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, bits: int):
        self._acc = (self._acc << bits) | (value & ((1 << bits) - 1))
        self._n += bits
        while self._n >= 8:
            self._n -= 8
            self.out.append((self._acc >> self._n) & 0xFF)
        self._acc &= (1 << self._n) - 1

    def bytes(self) -> bytes:
        assert self._n == 0, "unaligned"
        return bytes(self.out)


def _clock33(w: _BitWriter, seconds: float):
    """33-bit 90 kHz clock with marker bits (pack SCR / PES PTS body)."""
    t = int(round(seconds * 90000)) & ((1 << 33) - 1)
    w.write(t >> 30, 3)
    w.write(1, 1)
    w.write((t >> 15) & 0x7FFF, 15)
    w.write(1, 1)
    w.write(t & 0x7FFF, 15)
    w.write(1, 1)


def pack_header(scr_seconds: float = 0.0, mux_rate: int = 10000) -> bytes:
    w = _BitWriter()
    w.write(0x000001BA, 32)
    w.write(0x2, 4)              # MPEG-1 pack marker
    _clock33(w, scr_seconds)
    w.write(1, 1)
    w.write(mux_rate, 22)        # mux rate (units of 50 B/s)
    w.write(1, 1)
    return w.bytes()


def system_header(n_audio: int = 1, n_video: int = 1,
                  rate_bound: int = 10000) -> bytes:
    w = _BitWriter()
    w.write(0x000001BB, 32)
    w.write(6, 16)               # header length (bytes after this field)
    w.write(1, 1)
    w.write(rate_bound, 22)
    w.write(1, 1)
    w.write(n_audio, 6)          # audio bound
    w.write(0, 2)                # fixed, CSPS
    w.write(0, 2)                # audio/video lock
    w.write(1, 1)                # marker
    w.write(n_video, 5)          # video bound
    w.write(0xFF, 8)             # reserved
    return w.bytes()


def pes_packet(stream_id: int, payload: bytes, pts: float = None) -> bytes:
    w = _BitWriter()
    w.write(0x000001, 24)
    w.write(stream_id, 8)
    tail = 5 if pts is not None else 1
    w.write(len(payload) + tail, 16)
    if pts is not None:
        w.write(0x2, 4)          # '0010' PTS-only marker
        _clock33(w, pts)
    else:
        w.write(0x0F, 8)         # no PTS/DTS
    return w.bytes() + payload


def mux(video_es: bytes, audio_es: bytes, video_seconds: float,
        audio_seconds: float, target_seconds: float,
        chunk: int = 2048, out: io.IOBase = None) -> int:
    """Interleave looping ES content into a PS of ~target_seconds.

    PTS increases monotonically across loops; packets alternate by which
    stream's clock is behind (so neither buffer starves at decode time).
    Returns bytes written to `out` (a file-like opened for writing).
    """
    video_rate = len(video_es) / video_seconds   # bytes per second
    audio_rate = len(audio_es) / audio_seconds

    n = out.write(pack_header())
    n += out.write(system_header())

    v_sent = a_sent = 0
    v_total = a_total = 0.0

    def v_time():
        return v_total + v_sent / video_rate

    def a_time():
        return a_total + a_sent / audio_rate

    while min(v_time(), a_time()) < target_seconds:
        if v_time() <= a_time():
            part = video_es[v_sent:v_sent + chunk]
            n += out.write(pes_packet(0xE0, part, pts=v_time()))
            v_sent += len(part)
            if v_sent >= len(video_es):
                v_total += video_seconds
                v_sent = 0
        else:
            part = audio_es[a_sent:a_sent + chunk]
            n += out.write(pes_packet(0xC0, part, pts=a_time()))
            a_sent += len(part)
            if a_sent >= len(audio_es):
                a_total += audio_seconds
                a_sent = 0
    return n
