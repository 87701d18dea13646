"""Batched video decode: a window of pictures in one device dispatch.

The per-picture data dependency in MPEG-1 is a strict depth-2 chain
(forward/backward reference frames, video.go:406-433).  That maps to a
`lax.scan` whose carry is the (current, forward, backward) frame triple and
whose per-step input is one parsed picture plan.  The scan compiles once
per (geometry, window) and reconstructs `window` pictures per dispatch —
amortizing dispatch latency and keeping the whole pipeline on-device.

Frame rotation and display selection replicate the reference exactly:

- reference picture (I/P): MC reads the old backward frame (the reference
  aliases forward=backward before the slices); afterwards
  backward=decoded, current=old forward; the DISPLAYED frame is the old
  backward (1-frame delay, video.go:247-256);
- B picture: MC reads both; displayed immediately.

Independent streams stack on a leading axis via `jax.vmap`; shard that
axis over a mesh with `shard_map` (see parallel/sharding.py).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..ops.video_recon import FrameGeometry, reconstruct_picture
from ..tables import (
    PICTURE_TYPE_B, PICTURE_TYPE_INTRA, PICTURE_TYPE_PREDICTIVE,
)
from ..video import Frame, Video


def stack_plans(plans, geom: FrameGeometry, window: int):
    """Stack (plan, picture_type) pairs into scan inputs, padding with
    no-op steps (a no-op leaves the carry untouched)."""
    n = len(plans)
    assert n <= window
    mb = geom.mb_size
    out = {
        "coeffs": np.zeros((window, mb, 6, 64), np.int32),
        "nblocks": np.zeros((window, mb, 6), np.int32),
        "intra_blk": np.zeros((window, mb, 6), np.int32),
        "src_sel": np.zeros((window, mb), np.int32),
        "mv_h": np.zeros((window, mb), np.int32),
        "mv_v": np.zeros((window, mb), np.int32),
        "is_ref": np.zeros(window, np.int32),
        "is_noop": np.ones(window, np.int32),
    }
    for i, (plan, ptype) in enumerate(plans):
        out["coeffs"][i] = plan.coeffs
        out["nblocks"][i] = plan.nblocks
        out["intra_blk"][i] = plan.intra_blk
        out["src_sel"][i] = plan.src_sel
        out["mv_h"][i] = plan.mv_h
        out["mv_v"][i] = plan.mv_v
        out["is_ref"][i] = 1 if ptype in (PICTURE_TYPE_INTRA,
                                          PICTURE_TYPE_PREDICTIVE) else 0
        out["is_noop"][i] = 0
    return out


def pack_plans(plans, geom: FrameGeometry, window: int, k: int):
    """Packed scan inputs: coefficients as sparse (index, value) pairs and
    narrow dtypes for the flags/motion arrays.

    The host->device transfer is the throughput bottleneck for large
    frames (the dense coefficient tensor is 12.5 MB per 1080p picture,
    ~97% zeros); packing cuts the bytes ~20x.  The device densifies with
    one scatter-add per step.  `k` is the per-picture coefficient
    capacity (pad index 0 adds value 0 — harmless).
    """
    n = len(plans)
    assert n <= window
    mb = geom.mb_size
    out = {
        "coeff_idx": np.zeros((window, k), np.int32),
        "coeff_val": np.zeros((window, k), np.int32),
        "nblocks": np.zeros((window, mb, 6), np.int8),
        "intra_blk": np.zeros((window, mb, 6), np.int8),
        "src_sel": np.zeros((window, mb), np.int8),
        "mv_h": np.zeros((window, mb), np.int16),
        "mv_v": np.zeros((window, mb), np.int16),
        "is_ref": np.zeros(window, np.int32),
        "is_noop": np.ones(window, np.int32),
    }
    for i, (plan, ptype) in enumerate(plans):
        flat = plan.coeffs.reshape(-1)
        idx = np.flatnonzero(flat)
        if idx.size > k:
            raise ValueError(f"coefficient capacity {k} < {idx.size}")
        out["coeff_idx"][i, :idx.size] = idx
        out["coeff_val"][i, :idx.size] = flat[idx]
        out["nblocks"][i] = plan.nblocks
        out["intra_blk"][i] = plan.intra_blk
        out["src_sel"][i] = plan.src_sel
        out["mv_h"][i] = plan.mv_h
        out["mv_v"][i] = plan.mv_v
        out["is_ref"][i] = 1 if ptype in (PICTURE_TYPE_INTRA,
                                          PICTURE_TYPE_PREDICTIVE) else 0
        out["is_noop"][i] = 0
    return out


def count_plan_coeffs(plans) -> int:
    """Max nonzero coefficient count over a window of plans."""
    return max((int(np.count_nonzero(p.coeffs)) for p, _ in plans),
               default=0)


# --------------------------------------------------------------------------
# Blob transport: one contiguous byte buffer per window
# --------------------------------------------------------------------------
#
# Per-array device_put costs one tunnel/PCIe round trip each; with 9 plan
# arrays per window that overhead dominates the pipeline.  The blob packs
# every field of a window step into one uint8 row (fixed little-endian
# layout), so a whole window is ONE transfer; the device unpacks with
# free bitcast/slice ops.

BLOB_FIELDS = ("coeff_bid", "coeff_pos", "coeff_val",
               "mv_h", "mv_v", "nblocks", "intra_blk", "src_sel", "flags")


def blob_layout(geom: FrameGeometry, k: int):
    """Field offsets (bytes) within one step row.

    Coefficients are 6-byte records split across three arrays: block id
    (uint16, mb*6 < 65536 up to ~1080p-class geometries is NOT assumed —
    ids use uint32 when needed), position-in-block (uint8) and the
    premultiplied value as a signed 24-bit little-endian integer (range
    +-2^23 covers level*premult and the DC<<8 path with margin).
    """
    mb = geom.mb_size
    bid_bytes = 2 if mb * 6 <= 0xFFFF else 4
    fields = [
        ("coeff_bid", bid_bytes * k), ("coeff_pos", k), ("coeff_val", 3 * k),
        ("mv_h", 2 * mb), ("mv_v", 2 * mb),
        ("nblocks", 6 * mb), ("intra_blk", 6 * mb),
        ("src_sel", mb), ("flags", 4),   # bit0 = is_ref, bit1 = valid
    ]
    offs = {}
    pos = 0
    for name, size in fields:
        pos = (pos + 3) & ~3   # 4-byte align every field
        offs[name] = (pos, size)
        pos += size
    return offs, (pos + 3) & ~3


def pack_plans_blob(plans, geom: FrameGeometry, window: int, k: int):
    """Pack a window of plans into a [window, step_bytes] uint8 blob."""
    offs, step_bytes = blob_layout(geom, k)
    blob = np.zeros((window, step_bytes), np.uint8)

    def put(i, name, arr):
        off, size = offs[name]
        raw = arr.tobytes()
        assert len(raw) <= size
        blob[i, off:off + len(raw)] = np.frombuffer(raw, np.uint8)

    bid_dtype = np.uint16 if geom.mb_size * 6 <= 0xFFFF else np.uint32
    for i, (plan, ptype) in enumerate(plans):
        flat = plan.coeffs.reshape(-1)
        idx = np.flatnonzero(flat)
        if idx.size > k:
            raise ValueError(f"coefficient capacity {k} < {idx.size}")
        vals = flat[idx]
        put(i, "coeff_bid", (idx >> 6).astype(bid_dtype))
        put(i, "coeff_pos", (idx & 63).astype(np.uint8))
        v24 = vals.astype(np.int32)[:, None] >> np.array([0, 8, 16])
        put(i, "coeff_val", (v24 & 0xFF).astype(np.uint8))
        put(i, "mv_h", plan.mv_h.astype(np.int16))
        put(i, "mv_v", plan.mv_v.astype(np.int16))
        put(i, "nblocks", plan.nblocks.astype(np.int8))
        put(i, "intra_blk", plan.intra_blk.astype(np.int8))
        put(i, "src_sel", plan.src_sel.astype(np.int8))
        is_ref = ptype in (PICTURE_TYPE_INTRA, PICTURE_TYPE_PREDICTIVE)
        # bit0 = is_ref, bit1 = valid step (unset rows are no-op padding)
        put(i, "flags", np.asarray([(1 if is_ref else 0) | 2], np.int32))
    return blob


def relayout_blob_row(row, geom: FrameGeometry, old_k: int, new_k: int):
    """Re-layout a blob row for a larger coefficient capacity."""
    old_offs, _ = blob_layout(geom, old_k)
    new_offs, new_bytes = blob_layout(geom, new_k)
    out = np.zeros(new_bytes, np.uint8)
    for name, (off, size) in old_offs.items():
        noff, _nsize = new_offs[name]
        out[noff:noff + size] = row[off:off + size]
    return out


def unpack_blob_jax(row, geom: FrameGeometry, k: int):
    """Unpack one blob step row on device -> dense plan tensors."""
    import jax.numpy as jnp
    from jax import lax

    offs, _ = blob_layout(geom, k)
    mb = geom.mb_size

    def get(name, dtype, n):
        off, _size = offs[name]
        width = jnp.dtype(dtype).itemsize
        raw = row[off:off + n * width]
        if width == 1:
            return lax.bitcast_convert_type(raw, dtype)
        return lax.bitcast_convert_type(raw.reshape(n, width), dtype)

    bid_dtype = jnp.uint16 if mb * 6 <= 0xFFFF else jnp.uint32
    bid = get("coeff_bid", bid_dtype, k).astype(jnp.int32)
    pos = get("coeff_pos", jnp.uint8, k).astype(jnp.int32)
    raw = get("coeff_val", jnp.uint8, 3 * k).reshape(k, 3).astype(jnp.int32)
    # sign-extend the 24-bit little-endian value
    val = (raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)) << 8 >> 8
    coeffs = jnp.zeros(mb * 6 * 64, jnp.int32) \
        .at[bid * 64 + pos].add(val).reshape(mb, 6, 64)
    mv_h = get("mv_h", jnp.int16, mb).astype(jnp.int32)
    mv_v = get("mv_v", jnp.int16, mb).astype(jnp.int32)
    nblocks = get("nblocks", jnp.int8, 6 * mb).astype(jnp.int32) \
        .reshape(mb, 6)
    intra_blk = get("intra_blk", jnp.int8, 6 * mb).astype(jnp.int32) \
        .reshape(mb, 6)
    src_sel = get("src_sel", jnp.int8, mb).astype(jnp.int32)
    flags = get("flags", jnp.int32, 1)[0]
    is_ref = flags & 1
    is_noop = 1 - ((flags >> 1) & 1)
    return coeffs, nblocks, intra_blk, src_sel, mv_h, mv_v, is_ref, is_noop


def unpack_plan_jax(plan, geom: FrameGeometry):
    """Densify one packed scan step's plan on device (scatter-add; the
    zero-padding indices add value 0 at position 0 — harmless)."""
    import jax.numpy as jnp
    mb = geom.mb_size
    coeffs = jnp.zeros(mb * 6 * 64, jnp.int32) \
        .at[plan["coeff_idx"]].add(plan["coeff_val"]) \
        .reshape(mb, 6, 64)
    return (coeffs,
            plan["nblocks"].astype(jnp.int32),
            plan["intra_blk"].astype(jnp.int32),
            plan["src_sel"].astype(jnp.int32),
            plan["mv_h"].astype(jnp.int32),
            plan["mv_v"].astype(jnp.int32))


@__import__("functools").lru_cache(maxsize=None)
def make_scan_decoder(geom: FrameGeometry, packed: bool = False,
                      blob_k: int = 0, emit_rgba: bool = False):
    """Build the jitted scan: (carry, stacked plans) -> (carry, displays).

    carry = (current, forward, backward) flat uint8 frame buffers.
    displays[t] = the frame the reference's Decode() would return after
    picture t (old backward for reference pictures, the decoded picture
    for B pictures).  Validity of each display is tracked host-side.

    Plan transport: dense dict (packed=False), packed dict (packed=True)
    or — fastest — a single uint8 blob per window (blob_k > 0, giving the
    coefficient capacity; see pack_plans_blob).
    """
    import jax
    import jax.numpy as jnp

    def step(carry, plan):
        cur, fwd, bwd = carry

        if blob_k:
            (coeffs, nblocks, intra_blk, src_sel, mv_h, mv_v,
             is_ref, is_noop) = unpack_blob_jax(plan, geom, blob_k)
        elif packed:
            coeffs, nblocks, intra_blk, src_sel, mv_h, mv_v = \
                unpack_plan_jax(plan, geom)
            is_ref, is_noop = plan["is_ref"], plan["is_noop"]
        else:
            coeffs, nblocks, intra_blk, src_sel, mv_h, mv_v = (
                plan["coeffs"], plan["nblocks"], plan["intra_blk"],
                plan["src_sel"], plan["mv_h"], plan["mv_v"])
            is_ref, is_noop = plan["is_ref"], plan["is_noop"]
        run = 1 - is_noop

        # Reference pictures alias forward=backward before the slices.
        fwd_eff = jnp.where(is_ref > 0, bwd, fwd)
        new = reconstruct_picture(
            cur, fwd_eff, bwd, coeffs, nblocks, intra_blk,
            src_sel, mv_h, mv_v, geom, jnp)
        new = jnp.where(run > 0, new, cur)

        disp = jnp.where(is_ref > 0, bwd, new)
        if emit_rgba:
            # Fused on-device YCbCr->RGB (exact Go image/color integers).
            from ..ops.color import flat_frame_to_rgba
            disp = flat_frame_to_rgba(disp, geom, jnp)
        ref = (is_ref > 0) & (run > 0)
        cur2 = jnp.where(ref, fwd, new)
        fwd2 = jnp.where(ref, bwd, fwd)
        bwd2 = jnp.where(ref, new, bwd)
        return (cur2, fwd2, bwd2), disp

    @jax.jit
    def scan_decode(carry, plans):
        return jax.lax.scan(step, carry, plans)

    return scan_decode


class BatchVideoDecoder:
    """Throughput-oriented video decoder: host parse feeding windowed
    device dispatches.

    Mirrors Video.decode()'s output sequence (including the 1-frame
    reference delay and end-of-stream flush) but reconstructs `window`
    pictures per device round trip.
    """

    def __init__(self, buf, window: int = 32, transport: str = "blob",
                 use_native: bool = None):
        """`buf` is a Buffer (Python parse) or bytes (native parse).

        use_native: parse with the C++ parser (requires blob transport);
        default: native when available and the input is bytes.
        """
        from .. import native as native_mod
        if use_native is None:
            use_native = isinstance(buf, (bytes, bytearray)) and \
                native_mod.available()
        self.native = None
        self.video = None
        if use_native:
            assert transport == "blob", "native parse emits blob rows"
            data = buf if isinstance(buf, (bytes, bytearray)) else \
                bytes(buf.bytes())
            self.native = native_mod.NativeVideoParser(data)
        else:
            if isinstance(buf, (bytes, bytearray)):
                import io
                from ..buffer import Buffer
                b = Buffer(io.BytesIO(bytes(buf)))
                b.set_load_callback(b.load_reader_callback)
                buf = b
            self.video = Video(buf, backend="plan")
        self.window = window
        self.transport = transport   # "blob" | "packed" | "dense"
        self._scan = None
        self._scan_k = 0
        self._carry = None
        self._has_reference_frame = False
        self._types: list[int] = []
        # Packed coefficient capacity, bucketed to limit recompiles.
        self._k = 4096

    @property
    def geom(self) -> FrameGeometry:
        return self.native.geom() if self.native is not None \
            else self.video.geom

    def _has_header(self) -> bool:
        return self.native.has_header() if self.native is not None \
            else self.video.has_header()

    def _stream_ended(self) -> bool:
        if self.native is not None:
            return True   # native mode gets the whole buffer up front
        return self.video.buf.has_ended()

    def _ensure_device_state(self):
        import jax.numpy as jnp
        rebuild = self._scan is None or \
            (self.transport == "blob" and self._scan_k != self._k)
        if rebuild:
            self._scan = make_scan_decoder(
                self.geom,
                packed=self.transport == "packed",
                blob_k=self._k if self.transport == "blob" else 0)
            self._scan_k = self._k
        if self._carry is None:
            zero = jnp.zeros(self.geom.total_size, jnp.uint8)
            self._carry = (zero, zero, zero)

    def parse_window(self):
        """Parse up to `window` picture plans from the stream."""
        plans = []
        while len(plans) < self.window:
            item = self.video.parse_next_plan()
            if item is None:
                break
            plans.append(item)
        return plans

    def _native_window(self):
        """Parse up to `window` blob rows from the native parser."""
        rows, types = [], []
        while len(rows) < self.window:
            ptype = self.native.blob_prepare()
            if ptype == 0:
                break
            need = self.native.blob_coeff_count()
            if need > self._k:
                old_k = self._k
                while self._k < need:
                    self._k *= 2
                rows = [relayout_blob_row(r, self.geom, old_k, self._k)
                        for r in rows]
            _offs, step_bytes = blob_layout(self.geom, self._k)
            row = np.zeros(step_bytes, np.uint8)
            self.native.blob_emit(row, self._k)
            rows.append(row)
            types.append(ptype)
        return rows, types

    def decode_window(self) -> list[Optional[np.ndarray]]:
        """Parse + reconstruct one window; returns the displayed frames
        (flat uint8 device arrays; None entries are undisplayed)."""
        if not self._has_header():
            return []
        self._ensure_device_state()

        if self.native is not None:
            rows, types = self._native_window()
        else:
            plans = self.parse_window()
            rows, types = plans, [t for _, t in plans]

        if not rows:
            # End of stream: flush the pending reference frame.
            if self._has_reference_frame and self._stream_ended() \
                    and self._types and self._types[-1] != PICTURE_TYPE_B:
                self._has_reference_frame = False
                return [self._carry[2]]   # backward
            return []

        if self.native is not None:
            self._ensure_device_state()
            _offs, step_bytes = blob_layout(self.geom, self._k)
            stacked = np.zeros((self.window, step_bytes), np.uint8)
            stacked[:len(rows)] = rows
        elif self.transport in ("blob", "packed"):
            need = count_plan_coeffs(plans)
            while self._k < need:
                self._k *= 2   # grow the capacity bucket (recompile)
            self._ensure_device_state()
            if self.transport == "blob":
                stacked = pack_plans_blob(
                    plans, self.geom, self.window, self._k)
            else:
                stacked = pack_plans(plans, self.geom, self.window, self._k)
        else:
            stacked = stack_plans(plans, self.geom, self.window)
        self._carry, disps = self._scan(self._carry, stacked)

        out = []
        for i, ptype in enumerate(types):
            self._types.append(ptype)
            if ptype == PICTURE_TYPE_B:
                out.append(disps[i])
            elif self._has_reference_frame:
                out.append(disps[i])
            else:
                self._has_reference_frame = True
        return out

    def decode_all(self) -> list:
        """Decode the whole stream; returns flat frame buffers in display
        order."""
        frames = []
        while True:
            got = self.decode_window()
            if not got:
                break
            frames.extend(got)
        return frames
