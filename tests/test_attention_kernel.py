"""Flash-attention kernel correctness (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from openvla_probe_tpu.models import llama
from openvla_probe_tpu.ops.attention import flash_attention


@pytest.mark.parametrize("tq,tk", [(16, 16), (33, 47)])
def test_flash_matches_reference_attention(tq, tk, rng):
    B, H, Dh = 2, 3, 8
    q = jnp.asarray(rng.normal(size=(B, tq, H, Dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, tk, H, Dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, tk, H, Dh)).astype(np.float32))
    am = np.ones((B, tk), np.int64)
    am[1, tk - 3:] = 0
    mask = llama.make_causal_mask(jnp.asarray(am), tq, tk, offset=tk - tq)

    want = np.asarray(llama.attention(q, k, v, mask))
    got = np.asarray(flash_attention(q, k, v, mask, block_q=16, block_k=16, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_flash_fully_masked_rows_are_finite(rng):
    """Padded query rows (all keys masked) must not produce NaNs."""
    B, H, Dh, T = 1, 2, 8, 16
    q = jnp.asarray(rng.normal(size=(B, T, H, Dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, H, Dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, H, Dh)).astype(np.float32))
    mask = jnp.full((B, 1, T, T), llama.NEG_INF, jnp.float32)
    out = np.asarray(flash_attention(q, k, v, mask, block_q=16, block_k=16, interpret=True))
    assert np.isfinite(out).all()
