"""Multi-stream data parallelism over a device mesh.

Independent MPEG streams are embarrassingly parallel: the stream axis
shards over the mesh with `shard_map`, each device scanning its own
sub-batch of picture plans; the only collective is a `psum` of decoded
pixel counts (a cheap liveness/throughput stat that rides ICI).

This is the multi-chip story of the framework (SURVEY §2c): DP over
streams on ICI; the host demux/parse feeds per-device plan shards over
DCN.  No cross-stream communication exists in the problem, so there is
nothing for TP/PP to win — scale is breadth of streams and depth of
windows.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.video_recon import FrameGeometry, reconstruct_picture


def make_mesh(devices=None, axis: str = "streams") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def make_sharded_scan_decoder(geom: FrameGeometry, mesh: Mesh,
                              axis: str = "streams"):
    """Build the multi-stream scan decoder sharded over `mesh`.

    Shapes: carry buffers [S, total_size]; plans [S, T, ...] (stream-major
    so the shard slices are contiguous).  Returns (decode, stat) where
    decode(carry, plans) -> (carry', displays [S, T, total], decoded_px).
    """

    def step(carry, plan):
        cur, fwd, bwd = carry
        is_ref = plan["is_ref"]
        run = 1 - plan["is_noop"]
        fwd_eff = jnp.where(is_ref > 0, bwd, fwd)
        new = reconstruct_picture(
            cur, fwd_eff, bwd,
            plan["coeffs"], plan["nblocks"], plan["intra_blk"],
            plan["src_sel"], plan["mv_h"], plan["mv_v"],
            geom, jnp)
        new = jnp.where(run > 0, new, cur)
        disp = jnp.where(is_ref > 0, bwd, new)
        ref = (is_ref > 0) & (run > 0)
        return (jnp.where(ref, fwd, new),
                jnp.where(ref, bwd, fwd),
                jnp.where(ref, new, bwd)), (disp, run)

    def decode_one_stream(carry, plans):
        # plans leaves are [T, ...] for one stream.
        carry, (disps, runs) = jax.lax.scan(step, carry, plans)
        return carry, disps, jnp.sum(runs) * geom.frame_size

    def decode_shard(carry, plans):
        # carry leaves [S_shard, total]; plans [S_shard, T, ...]
        carry, disps, px = jax.vmap(decode_one_stream)(carry, plans)
        total_px = jax.lax.psum(jnp.sum(px), axis)
        return carry, disps, total_px

    sharded = jax.shard_map(
        decode_shard,
        mesh=mesh,
        in_specs=((P(axis), P(axis), P(axis)),
                  {k: P(axis) for k in ("coeffs", "nblocks", "intra_blk",
                                        "src_sel", "mv_h", "mv_v",
                                        "is_ref", "is_noop")}),
        out_specs=((P(axis), P(axis), P(axis)), P(axis), P()),
    )
    return jax.jit(sharded)


def stack_stream_plans(per_stream_plans, geom: FrameGeometry, window: int):
    """[stream][(plan, type)] -> stream-major stacked plan dict
    [S, T, ...]."""
    from .batch import stack_plans
    stacked = [stack_plans(p, geom, window) for p in per_stream_plans]
    return {k: np.stack([s[k] for s in stacked]) for k in stacked[0]}


def zero_carry(geom: FrameGeometry, n_streams: int, mesh: Mesh = None,
               axis: str = "streams"):
    z = jnp.zeros((n_streams, geom.total_size), jnp.uint8)
    if mesh is not None:
        sharding = NamedSharding(mesh, P(axis))
        z = jax.device_put(z, sharding)
    return (z, z, z)
