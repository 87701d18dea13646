"""Scaling layer: batched multi-picture decode and multi-stream sharding.

The reference decodes one macroblock at a time on one core; here whole
windows of pictures reconstruct in a single fused device dispatch
(`lax.scan` carrying the reference-frame rotation), independent streams
batch on a leading axis, and the stream axis shards over a device mesh.
"""

from .batch import BatchVideoDecoder, make_scan_decoder
from .audio_batch import BatchAudioDecoder
from .multistream import MultiStreamVideoDecoder

__all__ = ["BatchVideoDecoder", "BatchAudioDecoder",
           "MultiStreamVideoDecoder", "make_scan_decoder"]
