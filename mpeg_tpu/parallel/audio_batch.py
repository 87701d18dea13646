"""Batched MP2 decode: many frames of synthesis per device dispatch.

Host parse (native C++ when available) emits subband sample tensors; the
device runs one (frames*36)-step filterbank scan per window, carrying the
V ring buffers.  Output normalization stays on host for the exact IEEE
division (see ops/filterbank.py).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..ops import filterbank


class BatchAudioDecoder:
    """Throughput-oriented MP2 decoder: bytes in, PCM windows out."""

    def __init__(self, data: bytes, window: int = 32,
                 use_native: bool = None):
        window = max(4, window - window % 4)   # parallel path needs 4n frames
        from .. import native as native_mod
        if use_native is None:
            use_native = native_mod.available()
        self.window = window
        self.native = None
        self._pipeline = None
        self._py = None
        if use_native and bytes(data[:4]) == b"\x00\x00\x01\xBA":
            # MPEG-PS container: fully-native demux + MP2 parse.
            self._pipeline = native_mod.NativePipeline(bytes(data))
        elif use_native:
            self.native = native_mod.NativeAudioParser(bytes(data))
        else:
            import io
            from ..audio import Audio
            from ..buffer import Buffer
            buf = Buffer(io.BytesIO(bytes(data)))
            buf.set_load_callback(buf.load_reader_callback)
            self._py = Audio(buf, backend="numpy")

        self._synth = None
        self._v = None
        self._v_pos = None

    @property
    def samplerate(self) -> int:
        if self._pipeline is not None:
            return self._pipeline.samplerate
        if self.native is not None:
            self.native.has_header()
            return self.native.samplerate
        return self._py.samplerate()

    @property
    def channels(self) -> int:
        if self._pipeline is not None:
            return self._pipeline.channels
        if self.native is not None:
            self.native.has_header()
            return self.native.channels
        return self._py.get_channels()

    def _parse_frame(self) -> Optional[np.ndarray]:
        if self._pipeline is not None:
            return self._pipeline.parse_next_audio_frame()
        if self.native is not None:
            return self.native.parse_next_frame()
        a = self._py
        if a.next_frame_data_size == 0:
            a.next_frame_data_size = a._decode_header()
        if a.next_frame_data_size == 0 or \
                not a.buf.has(a.next_frame_data_size << 3):
            return None
        out = a._parse_frame()
        a.next_frame_data_size = 0
        return out

    def decode_window(self) -> Optional[np.ndarray]:
        """Decode up to `window` frames; returns interleaved float32
        [n_frames * 2304] or None at end of stream."""
        import jax.numpy as jnp

        frames = []
        while len(frames) < self.window:
            f = self._parse_frame()
            if f is None:
                break
            frames.append(f)
        if not frames:
            return None

        if self._synth is None:
            # Parallel (scan-free) synthesis: all DCTs at once, windowed
            # MAC as strided tap slices — bit-exact vs the per-step scan.
            self._synth = filterbank.make_synthesize_parallel_jax()
            self._v = jnp.zeros((15, 2, 64), jnp.float32)   # block history

        n = len(frames)
        samples = np.zeros((self.window, 36, 2, 32), np.int32)
        samples[:n] = frames
        u, self._v = self._synth(
            jnp.asarray(samples.reshape(-1, 2, 32)), self._v)
        u = np.asarray(u).reshape(self.window, 36, 2, 32)[:n]
        return filterbank.finalize_np(u).reshape(-1)

    def decode_all(self) -> np.ndarray:
        """Decode the whole stream to interleaved float32 PCM."""
        chunks = []
        while True:
            pcm = self.decode_window()
            if pcm is None:
                break
            chunks.append(pcm)
        return np.concatenate(chunks) if chunks else \
            np.zeros(0, np.float32)
