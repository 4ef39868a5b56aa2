"""Hoisted-matmul pipeline == per-block scan of _block_step, exactly."""
import jax
import numpy as np
import pytest
from functools import partial

import ac3acm_tpu.tables as T
from ac3acm_tpu.models.decoder import (StreamFormat, _block_step,
                                       _pipeline_body, init_carry)


def _rand_blocks(rng, n):
    return {
        "q": rng.standard_normal((n, 6, 256)).astype(np.float32) * 3000,
        "a": (2.0 ** -rng.integers(15, 30, (n, 6, 256))).astype(np.float32),
        "b": rng.uniform(0.2, 2.0, (n, 6, 256)).astype(np.float32),
        "blksw": rng.integers(0, 2, (n, 5)).astype(bool),
        "coeff": rng.uniform(0.5, 2.0, (n, 5)).astype(np.float32),
        "remat": rng.integers(0, 2, (n, 256)).astype(bool),
        "bias": np.full(n, 384.0, np.float32),
    }


@pytest.mark.parametrize("fmt", [
    StreamFormat(acmod=T.A52_3F2R, output=T.A52_STEREO, slev_zero=False,
                 chanbias=31),
    StreamFormat(acmod=T.A52_3F2R, output=T.A52_3F2R | T.A52_LFE,
                 slev_zero=False, chanbias=0),
    StreamFormat(acmod=T.A52_STEREO, output=T.A52_STEREO, slev_zero=True,
                 chanbias=0),
    StreamFormat(acmod=T.A52_3F2R, output=T.A52_MONO, slev_zero=False,
                 chanbias=31),
], ids=["51to20", "51id", "stereo", "51tomono"])
def test_hoisted_pipeline_equivalence(fmt):
    rng = np.random.default_rng(3)
    blocks = _rand_blocks(rng, 12)
    ref_fn = jax.jit(lambda c, b: jax.lax.scan(partial(_block_step, fmt), c, b))
    fast_fn = jax.jit(partial(_pipeline_body, fmt))
    c1, p1 = ref_fn(init_carry(), blocks)
    c2, p2 = fast_fn(init_carry(), blocks)
    p1, p2 = np.asarray(p1), np.asarray(p2)
    # identical math modulo matmul accumulation shape (vector-matrix in the
    # scan vs matrix-matrix hoisted): allow ~1 ulp of the peak.  Carries may
    # differ in never-read upper delay planes, so equivalence is checked
    # behaviourally: decode a continuation chunk from each carry.
    tol = 4e-6 * max(np.abs(p1).max(), 1.0)
    np.testing.assert_allclose(p1, p2, rtol=0, atol=tol)
    np.testing.assert_array_equal(np.asarray(c1[1]), np.asarray(c2[1]))
    blocks2 = _rand_blocks(np.random.default_rng(7), 12)
    _, q1 = ref_fn(c1, blocks2)
    _, q2 = fast_fn(c2, blocks2)
    q1, q2 = np.asarray(q1), np.asarray(q2)
    tol2 = 4e-6 * max(np.abs(q1).max(), 1.0)
    np.testing.assert_allclose(q1, q2, rtol=0, atol=tol2)
