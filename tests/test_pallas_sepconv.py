"""Fused SeparableConv Pallas kernel vs the XLA composition (interpret mode
on CPU; the compiled path is exercised on real TPU in bench/perf runs)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from migan_tpu.ops.pallas.sepconv import fused_sepconv, _xla_sepconv


@pytest.mark.parametrize("shape", [
    (2, 32, 16, 8, 12),
    (1, 16, 8, 8, 8),      # too small -> XLA fallback path
    (3, 64, 32, 16, 8),
    (2, 64, 64, 16, 16),
])
@pytest.mark.parametrize("use_noise", [False, True])
def test_fused_sepconv_matches_oracle(shape, use_noise):
    N, H, W, C, O = shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, H, W, C), jnp.float32)
    w_dw = jnp.asarray(rng.randn(3, 3, 1, C) * 0.3, jnp.float32)
    b_dw = jnp.asarray(rng.randn(C), jnp.float32)
    w_pw = jnp.asarray(rng.randn(1, 1, C, O) * 0.3, jnp.float32)
    noise = (jnp.asarray(rng.randn(H, W) * 0.1, jnp.float32)
             if use_noise else None)

    want = np.asarray(_xla_sepconv(x, w_dw, b_dw, w_pw, noise))
    got = np.asarray(fused_sepconv(x, w_dw, b_dw, w_pw, noise,
                                   interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
