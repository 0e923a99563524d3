"""Batch-folded fast path: bit-exact vs the standard generator."""

import numpy as np
import jax
import jax.numpy as jnp

from migan_tpu.models.migan_inference import (
    GeneratorConfig, generator_init, generator_apply,
)
from migan_tpu.models.migan_fold import generator_apply_fast, fold, unfold


def test_fold_unfold_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(4, 8, 8, 3), jnp.float32)
    np.testing.assert_array_equal(np.asarray(unfold(fold(x))),
                                  np.asarray(x))


def test_folded_generator_exact():
    cfg = GeneratorConfig(resolution=512)
    params = generator_init(jax.random.PRNGKey(0), cfg)

    def walk(t):
        for k, v in t.items():
            if isinstance(v, dict):
                walk(v)
            elif k == "noise_strength":
                t[k] = jnp.asarray(0.2)
    walk(params)
    # fully-convolutional small input keeps the test fast while exercising
    # the folded top stage
    x = jnp.asarray(np.random.RandomState(1).randn(2, 128, 128, 4),
                    jnp.float32)
    a = np.asarray(generator_apply(params, x, cfg))
    b = np.asarray(generator_apply_fast(params, x, cfg))
    np.testing.assert_array_equal(b, a)  # bit-exact in f32


def test_folded_fallback_odd_batch():
    cfg = GeneratorConfig(resolution=512)
    params = generator_init(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, 128, 128, 4), jnp.float32)
    y = generator_apply_fast(params, x, cfg)
    assert y.shape == (1, 128, 128, 3)
