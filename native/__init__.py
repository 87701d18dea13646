"""Native (C++) host components of mpeg_tpu.

In a source checkout this directory lives at the repo root as `native/`
(all docs cite it that way); installed wheels map it to
`mpeg_tpu._native` (see pyproject.toml) so `pip install` ships the
parser sources — mpeg_tpu/native.py builds them lazily on first use
with the host toolchain, keyed by a source digest.
"""
