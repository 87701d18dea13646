"""MultiStreamVideoDecoder: N independent streams decoded in lockstep
through ONE global record chain (stream s fills picture slots
[s*W, (s+1)*W) of a single logical window — the sum-of-fills transport
that removes per-stream pool-bucket pad slack)."""

import numpy as np
import pytest

from mpeg_tpu import native
from mpeg_tpu.parallel import BatchVideoDecoder, MultiStreamVideoDecoder

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="needs the native parser")


def _frames(dec):
    return [np.asarray(f)[:dec.geom.frame_size].copy()
            for f in dec.decode_all()]


def test_multistream_lockstep_matches_solo(mpeg1video_path, mpg_path):
    """Every stream of a mixed batch (raw ES, MPEG-PS, a truncated
    stream, a duplicate) decodes bit-exactly what a solo
    BatchVideoDecoder produces — including per-stream end-of-stream
    flushes at different rounds and the pool growth from the minimum
    buckets (the first I-heavy global window grows them)."""
    es = open(mpeg1video_path, "rb").read()
    ps = open(mpg_path, "rb").read()
    sources = [es, ps, es[:len(es) // 3], es]

    ms = MultiStreamVideoDecoder(sources, window=4)
    got = ms.decode_all()

    for s, data in enumerate(sources):
        want = _frames(BatchVideoDecoder(data, window=4))
        assert len(got[s]) == len(want), f"stream {s} frame count"
        for i, a in enumerate(got[s]):
            ga = np.asarray(a)[:ms.geom.frame_size]
            assert (ga == want[i]).all(), f"stream {s} frame {i}"
    # The shorter stream really is shorter (flush ordering exercised).
    assert len(got[2]) < len(got[0]) == len(got[3])


def test_multistream_chunked_device_map(mpeg1video_path):
    """chunks > 1 (the HBM working-set control: lax.map over vmap'd
    chunks) must not change a single byte."""
    es = open(mpeg1video_path, "rb").read()
    base = MultiStreamVideoDecoder([es, es], window=8, chunks=1)
    want = base.decode_all()
    chunked = MultiStreamVideoDecoder([es, es], window=8, chunks=2)
    got = chunked.decode_all()
    for s in range(2):
        assert len(got[s]) == len(want[s]) == 260
        for i, (a, b) in enumerate(zip(got[s], want[s])):
            assert (np.asarray(a) == np.asarray(b)).all(), (s, i)


def test_multistream_prefetch_parity(mpeg1video_path, mpg_path):
    """prefetch=True (background global-window parse, one window ahead)
    must reproduce the inline decode exactly — including growth from
    minimum buckets under the producer thread and per-stream flushes."""
    es = open(mpeg1video_path, "rb").read()
    ps = open(mpg_path, "rb").read()
    sources = [es, ps, es[:len(es) // 2]]

    want = MultiStreamVideoDecoder(sources, window=4).decode_all()
    got = MultiStreamVideoDecoder(sources, window=4,
                                  prefetch=True).decode_all()
    for s in range(len(sources)):
        assert len(got[s]) == len(want[s]) > 0, f"stream {s}"
        for i, (a, b) in enumerate(zip(got[s], want[s])):
            assert (np.asarray(a) == np.asarray(b)).all(), (s, i)
