#!/usr/bin/env python3
"""Benchmark: 1080p MPEG-1 decode throughput on one TPU chip.

Measures the sustained decode pipeline — packed picture plans streaming
host->device + windowed scan reconstruction (IDCT, motion compensation,
residual stores) on device, frames staying in HBM for downstream
consumers.  Baseline: libavcodec (via cv2) decoding the same elementary
stream on the host CPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

Details (parse cost, device-only time, audio Msamples/s) go to stderr.

Host parse runs on the native C++ parser (one instance per stream),
overlapped with transfer+reconstruct via a worker thread; streams loop
over the fixture to keep every round full.
"""

import json
import os
import struct
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BENCH_DIR = os.path.join(REPO, "bench_data")
FIXTURE = os.path.join(BENCH_DIR, "test1080.m1v")
PLANS = os.path.join(BENCH_DIR, "plans1080.npz")

WIDTH, HEIGHT, FRAMES = 1920, 1080, 32
WINDOW = 8
STREAMS = 4          # stream batch per dispatch round
ROUNDS = 6


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def ensure_fixture() -> str:
    """Synthesize a 1080p MPEG-1 elementary stream (libavcodec encoder via
    cv2, PIM1 fourcc), extracting the ES from the AVI container."""
    if os.path.exists(FIXTURE):
        return FIXTURE
    os.makedirs(BENCH_DIR, exist_ok=True)
    import cv2

    avi = os.path.join(BENCH_DIR, "tmp1080.avi")
    w = cv2.VideoWriter(avi, cv2.VideoWriter_fourcc(*"PIM1"), 30,
                        (WIDTH, HEIGHT))
    # Typical-video content: smooth regions + a few moving objects
    # (worst-case noise content just measures the encoder's max bitrate).
    rng = np.random.default_rng(7)
    base = rng.integers(40, 200, (HEIGHT // 128, WIDTH // 128, 3), np.uint8)
    base = cv2.resize(base, (WIDTH, HEIGHT), interpolation=cv2.INTER_CUBIC)
    base = cv2.GaussianBlur(base, (31, 31), 12)
    for i in range(FRAMES):
        m = np.float32([[1, 0, 2 * i], [0, 1, i]])
        frame = cv2.warpAffine(base, m, (WIDTH, HEIGHT),
                               borderMode=cv2.BORDER_WRAP)
        for obj in range(6):
            x = int((obj * 293 + i * (7 + obj)) % (WIDTH - 160))
            y = int((obj * 177 + i * (3 + obj)) % (HEIGHT - 160))
            cv2.circle(frame, (x + 80, y + 80), 60,
                       (int(40 * obj) % 255, 200, 90), -1)
        w.write(frame)
    w.release()

    data = open(avi, "rb").read()
    out = bytearray()

    def walk(pos, end):
        while pos + 8 <= end:
            fid = data[pos:pos + 4]
            size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
            if fid in (b"RIFF", b"LIST"):
                walk(pos + 12, pos + 8 + size)
            elif fid.endswith(b"dc"):
                out.extend(data[pos + 8:pos + 8 + size])
            pos += 8 + size + (size & 1)

    walk(12, len(data))
    open(FIXTURE, "wb").write(bytes(out))
    os.remove(avi)
    log(f"fixture: {FIXTURE} ({len(out)} bytes)")
    return FIXTURE


def baseline_fps(path: str) -> float:
    """libavcodec (cv2) single-decoder fps over the fixture."""
    import cv2
    cap = cv2.VideoCapture(path)
    n = 0
    t0 = time.time()
    while True:
        ok, _ = cap.read()
        if not ok:
            break
        n += 1
    dt = time.time() - t0
    return n / dt if dt > 0 else 0.0


def parse_plans(path: str, max_pictures: int):
    """Host-parse pictures into a packed window blob (cached: Python parse
    is the placeholder for the native parser)."""
    import mpeg_tpu as mpeg
    from mpeg_tpu.parallel.batch import pack_plans_blob, count_plan_coeffs

    buf = mpeg.Buffer(open(path, "rb"))
    buf.set_load_callback(buf.load_reader_callback)
    video = mpeg.Video(buf, backend="plan")
    assert video.has_header()
    geom = video.geom

    if os.path.exists(PLANS):
        z = np.load(PLANS)
        return geom, z["blob"], int(z["k"]), float(z["parse_spf"])

    t0 = time.time()
    plans = []
    while len(plans) < max_pictures:
        item = video.parse_next_plan()
        if item is None:
            break
        plans.append(item)
    parse_spf = (time.time() - t0) / max(1, len(plans))
    log(f"parsed {len(plans)} pictures, {parse_spf:.2f} s/frame (host python)")

    k = max(4096, 1 << int(np.ceil(np.log2(max(1, count_plan_coeffs(plans))))))
    blob = pack_plans_blob(plans[:WINDOW], geom, WINDOW, k)
    np.savez_compressed(PLANS, blob=blob, k=k, parse_spf=parse_spf)
    return geom, blob, k, parse_spf


def main():
    t_start = time.time()
    path = ensure_fixture()
    base_fps = baseline_fps(path)
    log(f"baseline (libavcodec single decoder): {base_fps:.1f} fps")

    import jax
    import jax.numpy as jnp
    from mpeg_tpu import native
    from mpeg_tpu.parallel.batch import (
        blob_layout, make_scan_decoder, relayout_blob_row,
    )

    devices = jax.devices()
    log(f"devices: {devices}")

    data = open(path, "rb").read()

    # --- host parse: native C++ parser emitting blob rows directly ---
    parser = native.NativeVideoParser(data)
    assert parser.has_header()
    geom = parser.geom()

    t0 = time.time()
    k = 4096
    rows, types = [], []
    while True:
        ptype = parser.blob_prepare()
        if ptype == 0:
            break
        need = parser.blob_coeff_count()
        if need > k:
            old_k = k
            while k < need:
                k *= 2
            rows = [relayout_blob_row(r, geom, old_k, k) for r in rows]
        _offs, step_bytes = blob_layout(geom, k)
        row = np.zeros(step_bytes, np.uint8)
        parser.blob_emit(row, k)
        rows.append(row)
        types.append(ptype)
    parse_dt = time.time() - t0
    log(f"native parse+blob: {len(rows)} pictures in {parse_dt:.2f}s "
        f"({parse_dt/len(rows)*1000:.1f} ms/pic, k={k}, "
        f"{rows[0].nbytes/1e6:.2f} MB/pic)")

    # --- device: multi-stream windowed scan over the parsed blobs ---
    _offs, step_bytes = blob_layout(geom, k)
    n_win = max(1, len(rows) // WINDOW)
    blob = np.zeros((WINDOW, step_bytes), np.uint8)
    blob[:] = rows[:WINDOW]
    blobs = np.broadcast_to(blob, (STREAMS,) + blob.shape).copy()

    scan = make_scan_decoder(geom, blob_k=k)
    vscan = jax.jit(jax.vmap(scan))
    z = jnp.zeros((STREAMS, geom.total_size), jnp.uint8)
    carry = (z, z, z)

    t0 = time.time()
    cur = jax.device_put(blobs)
    carry, disps = vscan(carry, cur)
    jax.block_until_ready(disps)
    log(f"compile+first window: {time.time()-t0:.1f}s")

    # Sustained end-to-end: for each round, RE-PARSE a window on host
    # (native parser), pack, transfer, reconstruct — double-buffered.
    parsers = [native.NativeVideoParser(data) for _ in range(STREAMS)]
    def host_window():
        out = np.zeros((STREAMS, WINDOW, step_bytes), np.uint8)
        for s, p in enumerate(parsers):
            for w in range(WINDOW):
                ptype = p.blob_prepare()
                if ptype == 0:   # loop the stream
                    parsers[s] = p = native.NativeVideoParser(data)
                    ptype = p.blob_prepare()
                p.blob_emit(out[s, w], k)
        return out

    from concurrent.futures import ThreadPoolExecutor
    pool = ThreadPoolExecutor(1)

    t0 = time.time()
    fut = pool.submit(host_window)
    for _ in range(ROUNDS):
        blob_np = fut.result()
        fut = pool.submit(host_window)   # parse next round concurrently
        carry, disps = vscan(carry, jax.device_put(blob_np))
    jax.block_until_ready(disps)
    dt = time.time() - t0
    frames = STREAMS * WINDOW * ROUNDS
    fps = frames / dt
    log(f"END-TO-END: {frames} frames in {dt:.2f}s -> {fps:.1f} fps "
        f"(native parse + blob h2d + device reconstruct, {STREAMS} "
        f"streams x window {WINDOW}, single host core)")

    # transfer+device only (parse excluded)
    pre = host_window()
    t0 = time.time()
    for _ in range(ROUNDS):
        carry, disps = vscan(carry, jax.device_put(pre))
    jax.block_until_ready(disps)
    xfer_fps = frames / (time.time() - t0)
    log(f"transfer+device only: {xfer_fps:.1f} fps")

    # device only (blob resident)
    cur = jax.device_put(pre)
    carry, disps = vscan(carry, cur)
    jax.block_until_ready(disps)
    t0 = time.time()
    for _ in range(ROUNDS):
        carry, disps = vscan(carry, cur)
    jax.block_until_ready(disps)
    dev_fps = frames / (time.time() - t0)
    log(f"device-only: {dev_fps:.1f} fps")

    # Secondary metrics ----------------------------------------------------
    # C++ host-only decoder (CPU fallback path) on the same fixture.
    t0 = time.time()
    hd = native.NativeHostDecoder(data)
    n = 0
    while hd.decode_next() is not None:
        n += 1
    log(f"C++ host-only decode: {n / (time.time() - t0):.1f} fps "
        f"(single core)")

    # MP2 audio: Msamples/s through native parse + batched filterbank.
    from mpeg_tpu.parallel import BatchAudioDecoder
    adata = open(os.path.join(REPO, "tests", "testdata", "test.mp2"),
                 "rb").read()
    BatchAudioDecoder(adata, window=64).decode_window()   # compile
    dec = BatchAudioDecoder(adata, window=64)
    t0 = time.time()
    total = 0
    while (pcm := dec.decode_window()) is not None:
        total += pcm.size // 2   # per-channel samples
    a_dt = time.time() - t0
    log(f"MP2 audio: {total} samples in {a_dt:.2f}s -> "
        f"{total / a_dt / 1e6:.2f} Msamples/s")

    log(f"total bench wall: {time.time()-t_start:.1f}s")

    print(json.dumps({
        "metric": "1080p MPEG-1 end-to-end decode fps/chip (native parse "
                  "+ packed h2d + TPU reconstruct; baseline: libavcodec "
                  "1-thread on the same single-core host)",
        "value": round(fps, 1),
        "unit": "fps",
        "vs_baseline": round(fps / base_fps, 2) if base_fps else 0.0,
    }))


if __name__ == "__main__":
    main()
