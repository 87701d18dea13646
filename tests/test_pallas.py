"""Pallas kernel parity tests (interpret mode on CPU)."""

import numpy as np
import pytest

from mpeg_tpu.ops import video_recon as vr
from tests.test_video_kernels import random_block

RNG = np.random.default_rng(7)


def test_idct_pallas_parity():
    from mpeg_tpu.ops.pallas_kernels import idct_batch_pallas

    blocks = []
    ns = []
    for n in (1, 2, 5, 9, 10, 33, 64):
        for _ in range(40):
            blocks.append(random_block(n))
            ns.append(n)
    coeffs = np.stack(blocks).astype(np.int32)
    nblocks = np.asarray(ns, np.int32)

    want = vr.idct_batch(coeffs, nblocks, np)
    got = np.asarray(idct_batch_pallas(coeffs, nblocks, interpret=True))
    assert np.array_equal(got, want)
