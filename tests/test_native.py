"""Native (C++) parser differential tests vs the Python oracle parser."""

import numpy as np
import pytest

import mpeg_tpu as mpeg
from mpeg_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_native_header(mpeg1video_path):
    p = native.NativeVideoParser(open(mpeg1video_path, "rb").read())
    assert p.has_header()
    assert p.width == 160
    assert p.height == 120
    assert p.framerate == 30.0


def test_native_plans_match_python(mpeg1video_path):
    """Every picture plan must match the Python parser exactly."""
    data = open(mpeg1video_path, "rb").read()
    nat = native.NativeVideoParser(data)

    buf = mpeg.Buffer(open(mpeg1video_path, "rb"))
    buf.set_load_callback(buf.load_reader_callback)
    py = mpeg.Video(buf, backend="plan")
    assert py.has_header()

    n = 0
    while True:
        a = nat.parse_next_plan()
        b = py.parse_next_plan()
        assert (a is None) == (b is None), f"picture {n}: presence differs"
        if a is None:
            break
        plan_a, type_a = a
        plan_b, type_b = b
        assert type_a == type_b, f"picture {n}: type {type_a} vs {type_b}"
        for field in ("coeffs", "nblocks", "intra_blk",
                      "src_sel", "mv_h", "mv_v"):
            va, vb = getattr(plan_a, field), getattr(plan_b, field)
            if not np.array_equal(va, vb):
                d = np.flatnonzero(va.reshape(-1) != vb.reshape(-1))
                raise AssertionError(
                    f"picture {n} field {field}: {d.size} diffs, first at "
                    f"{d[0]}: {va.reshape(-1)[d[0]]} vs "
                    f"{vb.reshape(-1)[d[0]]}")
        n += 1
    assert n == 261   # pictures decoded from the fixture


def test_native_streaming_feed(mpeg1video_path):
    """Chunked feed produces the same number of pictures."""
    data = open(mpeg1video_path, "rb").read()
    p = native.NativeVideoParser()
    n = 0
    for i in range(0, len(data), 8192):
        p.feed(data[i:i + 8192])
        while p.has_header() and (item := p.parse_next_plan()) is not None:
            n += 1
    p.signal_end()
    while (item := p.parse_next_plan()) is not None:
        n += 1
    assert n == 261


def test_native_blob_golden(mpeg1video_path):
    """End-to-end golden hash through native parse + blob + scan decode."""
    from mpeg_tpu.parallel import BatchVideoDecoder
    from mpeg_tpu.utils import Fnv1a64

    data = open(mpeg1video_path, "rb").read()
    dec = BatchVideoDecoder(data, window=16)
    assert dec.native is not None, "native parser expected"

    h = Fnv1a64()
    frames = 0
    while True:
        got = dec.decode_window()
        if not got:
            break
        for flat in got:
            flat = np.asarray(flat)
            h.write(flat[:dec.geom.frame_size].tobytes())
            frames += 1
    assert frames == 260
    assert h.sum64() == 0xEA6D7FCB1340BA3F, f"{h.sum64():#018x}"


def test_native_audio_matches_python(mp2_path):
    """Native MP2 parse must emit identical subband samples."""
    data = open(mp2_path, "rb").read()
    nat = native.NativeAudioParser(data)
    assert nat.has_header()
    assert nat.samplerate == 44100
    assert nat.channels == 1

    buf = mpeg.Buffer(open(mp2_path, "rb"))
    buf.set_load_callback(buf.load_reader_callback)
    py = mpeg.Audio(buf, backend="numpy", parser="python")
    assert py.has_header()

    n = 0
    while True:
        a = nat.parse_next_frame()
        # drive the python parser one frame
        if py.next_frame_data_size == 0:
            py.next_frame_data_size = py._decode_header()
        if py.next_frame_data_size == 0 or \
                not py.buf.has(py.next_frame_data_size << 3):
            b = None
        else:
            b = py._parse_frame()
            py.next_frame_data_size = 0
        assert (a is None) == (b is None), f"frame {n} presence differs"
        if a is None:
            break
        assert np.array_equal(a, b), f"frame {n} samples differ"
        n += 1
    assert n == 355


def test_batch_audio_golden(mp2_path):
    """Native parse + batched filterbank reproduces the audio golden hash."""
    from mpeg_tpu.parallel import BatchAudioDecoder
    from mpeg_tpu.utils import Fnv1a64
    from tests.test_audio import GOLDEN_AUDIO_HASHES

    dec = BatchAudioDecoder(open(mp2_path, "rb").read(), window=64)
    assert dec.samplerate == 44100
    pcm = dec.decode_all()
    assert pcm.size == 355 * 2304
    h = Fnv1a64()
    h.write(pcm.astype("<f4").tobytes())
    assert h.sum64() in GOLDEN_AUDIO_HASHES, f"{h.sum64():#018x}"


def test_native_demux_packet_parity(mpg_path):
    """Native demuxer must match the Python demuxer packet-for-packet:
    type, PTS and payload bytes."""
    data = open(mpg_path, "rb").read()
    nat = native.NativeDemuxer(data)
    assert nat.has_headers()

    buf = mpeg.Buffer(open(mpg_path, "rb"))
    buf.set_load_callback(buf.load_reader_callback)
    py = mpeg.Demux(buf)
    assert nat.get_num_video_streams() == py.get_num_video_streams()
    assert nat.get_num_audio_streams() == py.get_num_audio_streams()

    n = 0
    while True:
        a = nat.decode()
        b = py.decode()
        assert (a is None) == (b is None), f"packet {n}: presence differs"
        if a is None:
            break
        typ, pts, payload = a
        assert typ == b.type, f"packet {n}: type {typ:#x} vs {b.type:#x}"
        assert pts == b.pts, f"packet {n}: pts {pts} vs {b.pts}"
        assert payload == bytes(b.data), f"packet {n}: payload differs"
        n += 1
    assert n > 100   # the fixture carries hundreds of packets


def test_native_pipeline_ps_video(mpg_path):
    """Full .mpg decode through the native pipeline (C++ demux + parse,
    blob transport, device scan) matches the MPEG-class oracle
    frame-for-frame."""
    from mpeg_tpu.parallel import BatchVideoDecoder

    data = open(mpg_path, "rb").read()
    dec = BatchVideoDecoder(data, window=16)
    assert isinstance(dec.native, native.NativePipeline)
    assert dec.geom.width == 160 and dec.geom.height == 120
    frames = [np.asarray(f)[:dec.geom.frame_size] for f in dec.decode_all()]

    m = mpeg.MPEG(open(mpg_path, "rb"), backend="numpy",
                  config=mpeg.Config(parser="python"))
    n = 0
    while (f := m.decode_video()) is not None:
        want = np.concatenate([f.y.reshape(-1), f.cb.reshape(-1),
                               f.cr.reshape(-1)])
        assert np.array_equal(frames[n], want), f"frame {n} differs"
        n += 1
    assert n == len(frames) and n > 100


def test_native_pipeline_ps_audio(mpg_path):
    """PS audio through the native pipeline matches the MPEG-class
    oracle sample-for-sample."""
    from mpeg_tpu.parallel import BatchAudioDecoder

    data = open(mpg_path, "rb").read()
    dec = BatchAudioDecoder(data, window=64)
    assert dec._pipeline is not None
    assert dec.samplerate == 44100 and dec.channels == 1
    pcm = dec.decode_all()

    m = mpeg.MPEG(open(mpg_path, "rb"), backend="numpy",
                  config=mpeg.Config(parser="python"))
    chunks = []
    while (s := m.decode_audio()) is not None:
        chunks.append(np.asarray(s.interleaved))
    want = np.concatenate(chunks)
    assert pcm.size == want.size
    np.testing.assert_array_equal(pcm, want)


def test_native_host_decode_golden(mpeg1video_path):
    """The C++ host-only decoder reproduces the video golden hash."""
    from mpeg_tpu.utils import Fnv1a64
    from mpeg_tpu.ops.video_recon import FrameGeometry

    dec = native.NativeHostDecoder(open(mpeg1video_path, "rb").read())
    assert dec.has_header()
    geom = FrameGeometry.for_size(dec.width, dec.height)

    h = Fnv1a64()
    frames = 0
    while (flat := dec.decode_next()) is not None:
        h.write(flat[:geom.frame_size].tobytes())
        frames += 1
    assert frames == 260
    assert h.sum64() == 0xEA6D7FCB1340BA3F, f"{h.sum64():#018x}"


def test_native_reset_matches_fresh_parser(mpeg1video_path):
    """reset() returns a used parser to fresh-constructed behavior while
    keeping its buffers: same golden hash, and identical pool records on
    a recycled (dirty) window blob — blob_window initializes every field
    byte itself, so reuse without np.zeros must be safe."""
    from mpeg_tpu.parallel.batch import blob_layout, blob_views, pool_bucket
    from mpeg_tpu.parallel import BatchVideoDecoder
    from mpeg_tpu.utils import Fnv1a64

    data = open(mpeg1video_path, "rb").read()

    def golden(dec):
        h = Fnv1a64()
        while got := dec.decode_window():
            for flat in got:
                h.write(np.asarray(flat)[:dec.geom.frame_size].tobytes())
        return h.sum64()

    # Decode partway with one parser, reset it mid-stream, then run the
    # full golden decode through the SAME native parser object.
    p = native.NativeVideoParser(data)
    for _ in range(7):
        assert p.blob_prepare() != 0
        geom = p.geom()
        mb = geom.mb_size
        cm, ce = p.blob_counts()
        hb = (mb * 6 * 64 >> 16) + 2
        p.blob_emit(np.empty(2 * (cm + hb), np.uint16),
                    np.empty(ce + hb, np.uint16),
                    np.empty(ce + hb, np.int32),
                    np.zeros(mb, np.int16), np.zeros(mb, np.int16),
                    np.zeros(mb, np.uint16), np.zeros(mb, np.uint8), 0)
    p.reset(data)
    dec = BatchVideoDecoder(b"", window=16, streaming=True)
    dec.native = p
    dec._ended = True
    assert golden(dec) == 0xEA6D7FCB1340BA3F

    # Recycled-blob parity: fill a window into a garbage-filled buffer
    # and into a zeroed one; every field byte must come out identical.
    window = 16
    p1 = native.NativeVideoParser(data)
    geom = p1.geom()
    km = ke = None
    # discover capacities for the first window
    counts = []
    probe = native.NativeVideoParser(data)
    for _ in range(window):
        if probe.blob_prepare() == 0:
            break
        counts.append(probe.blob_counts())
        mb = geom.mb_size
        cm, ce = counts[-1]
        hb = (mb * 6 * 64 >> 16) + 2
        probe.blob_emit(np.empty(2 * (cm + hb), np.uint16),
                        np.empty(ce + hb, np.uint16),
                        np.empty(ce + hb, np.int32),
                        np.zeros(mb, np.int16), np.zeros(mb, np.int16),
                        np.zeros(mb, np.uint16), np.zeros(mb, np.uint8), 0)
    km = pool_bucket(sum(c[0] for c in counts), 4096)
    ke = pool_bucket(max(sum(c[1] for c in counts), 1), 64)
    _, total = blob_layout(geom, window, km, ke)

    outs = []
    for fill_byte in (0, 0xA5):
        blob = np.full(total, fill_byte, np.uint8)
        v = blob_views(blob, geom, window, km, ke)
        types = np.full(window, -1, np.int32)
        p2 = native.NativeVideoParser(data)
        n, nm, ne, pending, _pm, _pe = p2.blob_window(
            0, window, km, ke, 0, 0,
            v["main_rec"], v["esc_didx"], v["esc_val"],
            v["mv_h"], v["mv_v"], v["nbcls"], v["mbmisc"],
            v["flags"], types)
        assert n == window and pending == 0
        outs.append({k: a.copy() for k, a in v.items()})
    for k in outs[0]:
        np.testing.assert_array_equal(outs[0][k], outs[1][k], err_msg=k)


def test_native_blob_records_sorted(mpeg1video_path):
    """Scatter/delta ABI invariants: every window's cumsum-decoded main
    and escape chains stay inside the window's dense span (the scatters
    declare indices_are_sorted, which unsigned deltas make structural),
    value-0 main records appear only as hops (didx 0xFFFF) or pads
    (didx 0), and the native emitter produces BYTE-IDENTICAL blobs to
    the Python packer on the same pictures.  The fixture's damaged
    regions exercise the junk-tolerance paths, so this also covers
    re-touched blocks and re-predicted MBs."""
    from mpeg_tpu.parallel.batch import (
        blob_layout, blob_views, pack_plans_blob, pool_bucket,
    )

    data = open(mpeg1video_path, "rb").read()
    window = 16
    p = native.NativeVideoParser(data)
    geom = p.geom()
    mb = geom.mb_size
    km = pool_bucket(mb * 6 * 64 * window // 8, 4096)
    ke = pool_bucket(mb * 6 * 64 * window // 128, 512)
    _, total = blob_layout(geom, window, km, ke)
    span = window * mb * 6 * 64

    # Native windows: recycled (garbage-filled) buffer, whole stream.
    blob = np.full(total, 0x5A, np.uint8)
    v = blob_views(blob, geom, window, km, ke)
    types = np.empty(window, np.int32)
    oracle = native.NativeVideoParser(data)
    windows = 0
    first_native = None
    while True:
        n, nm, ne, pending, _pm, _pe = p.blob_window(
            0, window, km, ke, 0, 0,
            v["main_rec"], v["esc_didx"], v["esc_val"],
            v["mv_h"], v["mv_v"], v["nbcls"], v["mbmisc"],
            v["flags"], types)
        assert pending == 0
        if n == 0:
            break
        windows += 1
        if first_native is None:
            first_native = blob.copy()
        def lanes(views):
            rec = views["main_rec"].astype(np.int64)   # (didx, val) pairs
            return ((rec[0::2], rec[1::2], "main"),
                    (views["esc_didx"].astype(np.int64),
                     views["esc_val"].astype(np.int64), "esc"))

        for d, val, name in lanes(v):
            idx = np.cumsum(d)
            assert idx[-1] < span, \
                f"{name} chain leaves the dense span in window {windows}"
            zero = val == 0
            assert ((~zero) | (d == 0xFFFF) | (d == 0)).all(), \
                f"{name}: value-0 record that is neither hop nor pad"
        if n < window:
            break
    assert windows >= 2   # the fixture spans multiple windows

    # Python packer: same invariant AND byte-for-byte emit parity with
    # the native window above (one encoding, two implementations).
    plans = []
    while (item := oracle.parse_next_plan()) is not None:
        plans.append(item)
    pb = pack_plans_blob(plans[:window], geom, window, km, ke)
    pv = blob_views(pb, geom, window, km, ke)
    assert np.cumsum(pv["main_rec"].astype(np.int64)[0::2])[-1] < span
    assert np.cumsum(pv["esc_didx"].astype(np.int64))[-1] < span
    np.testing.assert_array_equal(pb, first_native)


@pytest.mark.parametrize("i", range(0, 12, 2))
def test_native_plans_match_python_on_junk(i, mpeg1video_path):
    """Differential fuzz: on BIT-FLIPPED streams the native parser must
    still produce plan-for-plan exactly what the Python oracle does —
    the reference's junk tolerance is deterministic (invalid VLC
    prefixes decode as 0, scratch leaks clear, resync scans forward:
    video.go:101,676-745), so corrupt input is where a fresh table
    transcription (e.g. the subsequent-coefficient DCT fast path)
    would first diverge."""
    data = bytearray(open(mpeg1video_path, "rb").read())
    for off in range((7 * (i + 1)) % len(data), len(data), 4099):
        data[off] ^= 1 << (i % 8)
    data = bytes(data)

    nat = native.NativeVideoParser(data)

    import io
    buf = mpeg.Buffer(io.BytesIO(data))
    buf.set_load_callback(buf.load_reader_callback)
    py = mpeg.Video(buf, backend="plan", parser="python")

    if not (nat.has_header() and py.has_header()):
        assert nat.has_header() == py.has_header()
        return

    n = 0
    while n < 300:
        a = nat.parse_next_plan()
        b = py.parse_next_plan()
        assert (a is None) == (b is None), f"picture {n}: presence differs"
        if a is None:
            break
        plan_a, type_a = a
        plan_b, type_b = b
        assert type_a == type_b, f"picture {n}: type {type_a} vs {type_b}"
        for field in ("coeffs", "nblocks", "intra_blk",
                      "src_sel", "mv_h", "mv_v"):
            assert np.array_equal(getattr(plan_a, field),
                                  getattr(plan_b, field)), \
                f"picture {n} field {field} differs (bitflip variant {i})"
        n += 1
    assert n > 0   # the flipped stream still yields pictures


@pytest.mark.parametrize("i", range(0, 12, 2))
def test_native_audio_matches_python_on_junk(i, mp2_path):
    """Differential fuzz for the MP2 parser: on bit-flipped streams the
    native parser's framesync/resync and allocation decode must track
    the Python oracle frame-for-frame (audio.go:150-175 resync
    semantics are deterministic on junk)."""
    data = bytearray(open(mp2_path, "rb").read())
    for off in range((11 * (i + 1)) % len(data), len(data), 2039):
        data[off] ^= 1 << (i % 8)
    data = bytes(data)

    import io
    nat = native.NativeAudioParser(data)
    buf = mpeg.Buffer(io.BytesIO(data))
    buf.set_load_callback(buf.load_reader_callback)
    py = mpeg.Audio(buf, backend="numpy", parser="python")

    if not (nat.has_header() and py.has_header()):
        assert nat.has_header() == py.has_header()
        return

    n = 0
    while n < 400:
        a = nat.parse_next_frame()
        if py.next_frame_data_size == 0:
            py.next_frame_data_size = py._decode_header()
        if py.next_frame_data_size == 0 or \
                not py.buf.has(py.next_frame_data_size << 3):
            b = None
        else:
            b = py._parse_frame()
            py.next_frame_data_size = 0
        assert (a is None) == (b is None), \
            f"frame {n} presence differs (variant {i})"
        if a is None:
            break
        assert np.array_equal(a, b), f"frame {n} samples differ (variant {i})"
        n += 1
    assert n > 0


def test_native_emit_hops_match_python(mpeg1video_path):
    """The C++ emitter's hop loop (gaps over 64K in the uint16 delta
    chain) never fires on the fixtures — the 160x120 picture span is
    under 64K — so force it through the emit ABI: emit one real picture
    at a large idx_base with a fresh chain (prev 0), where the boundary
    gap alone requires hops, and require byte-for-byte agreement with
    the Python delta encoder over the same records."""
    from mpeg_tpu.parallel.batch import delta_encode, plan_pool_records

    data = open(mpeg1video_path, "rb").read()
    p = native.NativeVideoParser(data)
    geom = p.geom()
    mb = geom.mb_size
    span = mb * 6 * 64
    base = 7 * span              # gap ~215K from prev=0: >= 3 hops
    assert p.blob_prepare() != 0
    cm, ce = p.blob_counts()
    hb = ((base + span) >> 16) + 2
    rec = np.empty(2 * (cm + hb), np.uint16)
    ei = np.empty(ce + hb, np.uint16)
    ev = np.empty(ce + hb, np.int32)
    meta = (np.zeros(mb, np.int16), np.zeros(mb, np.int16),
            np.zeros(mb, np.uint16), np.zeros(mb, np.uint8))
    _flags, nm, ne, _pm, _pe = p.blob_emit(rec, ei, ev, *meta, base,
                                           prev_m=0, prev_e=0)
    assert nm > cm, "the base jump must have emitted hop records"

    # Python reference over the same picture's records.
    oracle = native.NativeVideoParser(data)
    plan, _t = oracle.parse_next_plan()
    mi, mv, emi, emv = plan_pool_records(plan)
    didx, pos = delta_encode(mi + base)
    vals = np.zeros(didx.size, np.int16)
    vals[pos] = mv
    assert didx.size == nm
    np.testing.assert_array_equal(rec[0:2 * nm:2], didx)
    np.testing.assert_array_equal(
        rec.view(np.int16)[1:2 * nm:2], vals)
    d = rec[0:2 * nm:2].astype(np.int64)
    assert int(d.sum()) == int(mi[-1]) + base   # chain decodes exactly
