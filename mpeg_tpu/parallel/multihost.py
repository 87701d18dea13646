"""Multi-host (DCN) data-parallel decode — the SURVEY §2c "multi-host
feed over DCN" leg.

Topology: N processes (hosts) join one `jax.distributed` job; their
devices form a single global mesh.  Each process runs its OWN demux +
parse and feeds only its local devices' stream shards
(`jax.make_array_from_process_local_data`), so the host->device feed
stays host-local; streams are embarrassingly parallel, so the only
cross-host traffic is the psum'd decoded-pixel stat and XLA/runtime
coordination — on real pods that edge rides DCN, intra-host sharding
rides ICI.

The dryrun self-provisions without N real hosts: `run_worker()` is
executed by N local processes (tests/test_multihost.py, or
`python -m mpeg_tpu.parallel.multihost`), each holding
`--xla_force_host_platform_device_count` virtual CPU devices and
coordinating over localhost.  Process boundaries, global-mesh
semantics, per-process feeding and the cross-process psum are all real;
only the wire is loopback.

Each worker decodes the reference fixture on every local stream and
asserts the full golden hash (0xea6d7fcb1340ba3f, mpeg_test.go:227)
including the end-of-stream flush frame — the same contract as the
single-process mesh tests (tests/test_sharding.py).
"""

from __future__ import annotations

import argparse
import os
import sys


GOLDEN_VIDEO_HASH = 0xEA6D7FCB1340BA3F


def run_worker(process_id: int, num_processes: int, port: int,
               local_devices: int, fixture: str, window: int = 16) -> str:
    """One host's role in the multi-host decode; returns a report line.

    Must run in a fresh process: sets platform env before importing jax.
    """
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags +
            f" --xla_force_host_platform_device_count={local_devices}"
        ).strip()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from ..utils.bitexact import enable_cpu_bitexact
    enable_cpu_bitexact()

    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes,
        process_id=process_id)

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..buffer import Buffer
    from ..tables import PICTURE_TYPE_B
    from ..utils import Fnv1a64
    from ..video import Video
    from . import sharding as sh
    from .batch import count_pool_records, pool_bucket

    assert len(jax.local_devices()) == local_devices
    assert len(jax.devices()) == num_processes * local_devices
    n_local = local_devices          # one stream per local device
    n_global = len(jax.devices())

    # --- host-local feed: THIS process parses only its own streams ---
    videos = []
    for _ in range(n_local):
        buf = Buffer(open(fixture, "rb"))
        buf.set_load_callback(buf.load_reader_callback)
        videos.append(Video(buf, backend="plan"))
    assert all(v.has_header() for v in videos)
    geom = videos[0].geom

    all_windows = []
    while True:
        per_stream = []
        for v in videos:
            plans = []
            while len(plans) < window:
                item = v.parse_next_plan()
                if item is None:
                    break
                plans.append(item)
            per_stream.append(plans)
        if not any(per_stream):
            break
        all_windows.append(per_stream)
    nm = max(count_pool_records(p)[0] for w in all_windows for p in w if p)
    ne = max(count_pool_records(p)[1] for w in all_windows for p in w if p)
    km, ke = pool_bucket(nm, 4096), pool_bucket(max(ne, 1), 64)

    mesh = sh.make_mesh(jax.devices())   # global mesh across processes
    spec = NamedSharding(mesh, P("streams"))
    decode = sh.make_sharded_blob_decoder(geom, mesh, window, km, ke)

    def globalize(local_np):
        return jax.make_array_from_process_local_data(spec, local_np)

    carry = tuple(
        globalize(np.zeros((n_local, geom.total_size), np.uint8))
        for _ in range(3))

    hashes = [Fnv1a64() for _ in range(n_local)]
    counts = [0] * n_local
    has_ref = [False] * n_local
    last_type = [0] * n_local

    def local_shards(garr):
        """Addressable [stream-in-process, ...] slices, process order."""
        shards = sorted(garr.addressable_shards,
                        key=lambda s: s.index[0].start)
        return [np.asarray(s.data)[0] for s in shards]

    for per_stream in all_windows:
        blobs = globalize(sh.stack_stream_blobs(
            per_stream, geom, window, km, ke))
        carry, disps, total_px = decode(carry, blobs)
        # the psum rides the cross-process edge; every process sees the
        # GLOBAL pixel count
        want_px = sum(len(p) for p in per_stream) * geom.frame_size
        assert int(np.asarray(total_px)) == want_px * num_processes, \
            "cross-host psum mismatch"
        for s, disp in enumerate(local_shards(disps)):
            for i, (_, t) in enumerate(per_stream[s]):
                last_type[s] = t
                if t == PICTURE_TYPE_B or has_ref[s]:
                    hashes[s].write(disp[i, :geom.frame_size].tobytes())
                    counts[s] += 1
                else:
                    has_ref[s] = True

    for s, bwd in enumerate(local_shards(carry[2])):
        if has_ref[s] and last_type[s] != PICTURE_TYPE_B:
            hashes[s].write(bwd[:geom.frame_size].tobytes())
            counts[s] += 1

    for s in range(n_local):
        assert counts[s] == 260, f"stream {s}: {counts[s]} frames"
        assert hashes[s].sum64() == GOLDEN_VIDEO_HASH, \
            f"stream {s}: {hashes[s].sum64():#018x}"

    jax.distributed.shutdown()
    return (f"OK process {process_id}/{num_processes}: {n_local} local "
            f"streams of {n_global} global, golden "
            f"{GOLDEN_VIDEO_HASH:#018x} on all, window {window}")


def launch(num_processes: int = 2, local_devices: int = 4,
           fixture: str = None, window: int = 16,
           timeout: float = 600.0) -> list[str]:
    """Self-provision the multi-host dryrun: spawn `num_processes` local
    worker processes against a fresh coordinator port; returns their
    report lines (raises on any failure)."""
    import socket
    import subprocess

    if fixture is None:
        fixture = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            "tests", "testdata", "test.mpeg1video")
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    procs = []
    for pid in range(num_processes):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)       # worker sets its own count
        env["JAX_PLATFORMS"] = "cpu"
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "mpeg_tpu.parallel.multihost",
             "--process-id", str(pid),
             "--num-processes", str(num_processes),
             "--port", str(port),
             "--local-devices", str(local_devices),
             "--fixture", fixture,
             "--window", str(window)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))))))
    reports = []
    errs = []
    for pid, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        if p.returncode != 0:
            errs.append(f"process {pid} rc={p.returncode}:\n{err[-2000:]}")
        else:
            reports.append(out.strip().splitlines()[-1])
    if errs:
        raise RuntimeError("multi-host dryrun failed:\n" + "\n".join(errs))
    return reports


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--fixture", required=True)
    ap.add_argument("--window", type=int, default=16)
    a = ap.parse_args()
    print(run_worker(a.process_id, a.num_processes, a.port,
                     a.local_devices, a.fixture, a.window), flush=True)


if __name__ == "__main__":
    main()
