#!/usr/bin/env python3
"""Throughput decode: a raw mpeg1video ES through the windowed scan path.

Usage: python examples/batch_decode.py [file.m1v]

One device dispatch reconstructs a whole window of pictures (native C++
parse feeding packed plan blobs); frames stay on device — here we just
pull stats and one thumbnail back.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import mpeg_tpu as mpeg
from mpeg_tpu.parallel import BatchVideoDecoder


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(os.path.dirname(__file__), "..",
                     "tests", "testdata", "test.mpeg1video")
    data = open(path, "rb").read()

    dec = BatchVideoDecoder(data, window=32)
    t0 = time.time()
    frames = dec.decode_all()
    dt = time.time() - t0
    geom = dec.geom
    print(f"{geom.width}x{geom.height}: {len(frames)} frames in {dt:.2f}s "
          f"({len(frames)/dt:.1f} fps incl. compile)")

    last = np.asarray(frames[-1])
    y = last[:geom.luma_size].reshape(geom.luma_height, geom.luma_width)
    print(f"last frame luma mean {y.mean():.1f}")


if __name__ == "__main__":
    main()
