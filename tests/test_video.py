"""MPEG-1 video decoder tests: metadata, golden end-to-end hash, parity.

Mirrors the reference strategy (mpeg_test.go:205-274): the video path is
all-integer, so one golden hash anchors every backend.
"""

import numpy as np
import pytest

import mpeg_tpu as mpeg
from mpeg_tpu.utils import Fnv1a64

GOLDEN_VIDEO_HASH = 0xEA6D7FCB1340BA3F   # mpeg_test.go:227


def new_video(path, backend, parser="auto"):
    buf = mpeg.Buffer(open(path, "rb"))
    buf.set_load_callback(buf.load_reader_callback)
    return mpeg.Video(buf, backend=backend, parser=parser)


def test_video_header(mpeg1video_path):
    video = new_video(mpeg1video_path, "numpy")
    assert video.has_header()
    assert video.get_width() == 160
    assert video.get_height() == 120
    assert video.framerate() == 30.0

    frame = video.decode()
    assert frame is not None
    assert frame.width == 160
    assert frame.y.size == 20480
    assert frame.cb.size == frame.y.size // 4


def decode_all_hash(video, max_frames=10**9):
    h = Fnv1a64()
    frames = 0
    while frames < max_frames:
        frame = video.decode()
        if frame is None:
            break
        h.write(frame.y.tobytes())
        h.write(frame.cb.tobytes())
        h.write(frame.cr.tobytes())
        frames += 1
    return h.sum64(), frames


@pytest.mark.parametrize("backend,parser", [
    ("numpy", "python"), ("numpy", "auto"), ("jax", "auto"),
])
def test_video_golden(mpeg1video_path, backend, parser):
    video = new_video(mpeg1video_path, backend, parser)
    digest, frames = decode_all_hash(video)
    assert frames > 0
    assert digest == GOLDEN_VIDEO_HASH, \
        f"video output hash {digest:#018x} (frames={frames})"


def test_video_backend_parity(mpeg1video_path):
    """numpy oracle and JAX reconstruction agree bytewise per frame."""
    v_np = new_video(mpeg1video_path, "numpy")
    v_jx = new_video(mpeg1video_path, "jax")
    for i in range(12):
        f_np = v_np.decode()
        f_jx = v_jx.decode()
        assert (f_np is None) == (f_jx is None)
        if f_np is None:
            break
        assert np.array_equal(f_np.y, f_jx.y), f"frame {i} luma differs"
        assert np.array_equal(f_np.cb, f_jx.cb), f"frame {i} cb differs"
        assert np.array_equal(f_np.cr, f_jx.cr), f"frame {i} cr differs"


def test_rgba(mpeg1video_path):
    video = new_video(mpeg1video_path, "numpy")
    frame = video.decode()
    rgba = frame.rgba()
    assert rgba.shape == (120, 160, 4)
    assert rgba.dtype == np.uint8
    assert (rgba[..., 3] == 255).all()
    assert frame.pixels().shape == (120 * 160, 4)


def test_set_no_delay(mpeg1video_path):
    """SetNoDelay display rule (video.go:247-256 noDelay branch): every
    picture returns the backward frame immediately — verified against an
    independent plan-parse + numpy-reconstruction oracle."""
    import pytest
    from mpeg_tpu.ops.video_recon import reconstruct_picture
    from mpeg_tpu.tables import PICTURE_TYPE_B

    buf = mpeg.Buffer(open(mpeg1video_path, "rb"))
    buf.set_load_callback(buf.load_reader_callback)
    v = mpeg.Video(buf, backend="plan")
    assert v.has_header()
    geom = v.geom

    cur = np.zeros(geom.total_size, np.uint8)
    fwd = np.zeros(geom.total_size, np.uint8)
    bwd = np.zeros(geom.total_size, np.uint8)
    want = []
    while (item := v.parse_next_plan()) is not None:
        plan, ptype = item
        is_ref = ptype != PICTURE_TYPE_B
        new = reconstruct_picture(
            cur, bwd if is_ref else fwd, bwd, plan.coeffs, plan.nblocks,
            plan.intra_blk, plan.src_sel, plan.mv_h, plan.mv_v, geom, np)
        if is_ref:
            cur, fwd, bwd = fwd, bwd, new
        else:
            cur = new
        want.append(bwd[:geom.frame_size].copy())

    for parser in ("python", "native"):
        buf2 = mpeg.Buffer(open(mpeg1video_path, "rb"))
        buf2.set_load_callback(buf2.load_reader_callback)
        v2 = mpeg.Video(buf2, backend="numpy", parser=parser)
        v2.set_no_delay(True)
        n = 0
        while (f := v2.decode()) is not None:
            got = np.concatenate([f.y.reshape(-1), f.cb.reshape(-1),
                                  f.cr.reshape(-1)])
            assert np.array_equal(got, want[n]), \
                f"{parser}: frame {n} differs"
            n += 1
        # no-delay: every picture displays; no end-of-stream flush delay
        assert n == len(want) == 261, f"{parser}: {n} frames"


def test_frame_ycbcr_view(mpeg1video_path):
    """Frame.ycbcr() mirrors the reference's Frame.YCbCr() (video.go:
    26-35): display-cropped zero-copy plane views over the shared
    buffer, while .y/.cb/.cr keep the macroblock-rounded storage."""
    import mpeg_tpu as mpeg

    buf = mpeg.Buffer(open(mpeg1video_path, "rb"))
    buf.set_load_callback(buf.load_reader_callback)
    v = mpeg.Video(buf)
    f = v.decode()
    y, cb, cr = f.ycbcr()
    assert y.shape == (f.height, f.width)
    assert cb.shape == ((f.height + 1) // 2, (f.width + 1) // 2)
    assert cr.shape == cb.shape
    # zero-copy: the views alias the frame buffer
    assert y.base is not None
    np.testing.assert_array_equal(y, f.y[:f.height, :f.width])
