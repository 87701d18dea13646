"""Config plumbing + DecodeStats wiring (SURVEY §5 config/metrics rows)."""

import numpy as np

import mpeg_tpu as mpeg
from mpeg_tpu.audio import AudioFormat


def test_config_reaches_decoders(mpg_path):
    cfg = mpeg.Config(backend="numpy", parser="python",
                      audio_lead_time=0.25, audio_format=AudioFormat.S16,
                      buffer_size=32 * 1024)
    m = mpeg.MPEG(open(mpg_path, "rb"), config=cfg)
    assert m.backend == "numpy"
    assert m.audio_lead_time == 0.25
    assert m.video_decoder.backend == "numpy"
    assert m.video_decoder.parser == "python"
    assert m.audio_decoder.parser == "python"
    assert m.audio_format() == AudioFormat.S16
    f = m.decode_video()
    assert f is not None and f.y.shape == (128, 160)
    s = m.decode_audio()
    # S16 interleaved L/R pairs (mono duplicates): 1152 * 2ch * 2 bytes.
    assert s is not None and len(s.bytes()) == 1152 * 2 * 2


def test_explicit_args_beat_config(mpg_path):
    cfg = mpeg.Config(backend="numpy")
    m = mpeg.MPEG(open(mpg_path, "rb"), backend="jax", config=cfg)
    assert m.backend == "jax"


def test_batch_decoder_stats(mpeg1video_path):
    from mpeg_tpu.parallel import BatchVideoDecoder
    from mpeg_tpu.utils.profiling import DecodeStats

    stats = DecodeStats()
    dec = BatchVideoDecoder(open(mpeg1video_path, "rb").read(),
                            window=64, stats=stats)
    frames = dec.decode_all()
    assert len(frames) == 260
    assert stats.frames == 261          # parsed pictures (incl. undisplayed)
    assert stats.transfer_bytes > 0
    assert stats.host_seconds > 0
    assert stats.device_seconds > 0
    s = stats.summary()
    assert s["frames"] == 261 and s["transfer_mb"] > 0


def test_batch_decoder_config(mpeg1video_path):
    from mpeg_tpu.parallel import BatchVideoDecoder

    cfg = mpeg.Config(window=16, transport="dense")
    dec = BatchVideoDecoder(open(mpeg1video_path, "rb").read(),
                            use_native=False, config=cfg)
    assert dec.window == 16
    assert dec.transport == "dense"
    got = dec.decode_window()
    assert got and np.asarray(got[0]).size == dec.geom.total_size


def test_device_trace_smoke(tmp_path):
    """utils.profiling.device_trace captures a jax.profiler trace."""
    import jax.numpy as jnp
    from mpeg_tpu.utils.profiling import device_trace

    with device_trace(str(tmp_path)):
        jnp.arange(8).sum().block_until_ready()
    produced = list(tmp_path.rglob("*"))
    assert produced, "no trace artifacts written"


def test_batch_audio_decoder_stats(mp2_path):
    from mpeg_tpu.parallel import BatchAudioDecoder
    from mpeg_tpu.utils.profiling import DecodeStats

    stats = DecodeStats()
    dec = BatchAudioDecoder(open(mp2_path, "rb").read(), window=64,
                            stats=stats)
    pcm = dec.decode_all()
    assert stats.samples == pcm.size // 2 == 355 * 1152
    assert stats.transfer_bytes > 0 and stats.device_seconds > 0
