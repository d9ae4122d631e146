"""Unit coverage for the trained-weight parity harness's load-bearing pieces.

The full harness runs on the chip (PARITY_r03.md); these tests pin the parts
whose silent drift would invalidate a future run: the deterministic
tokenizer (adapters must survive process restarts), the generalizing target
design, and the on-device merge+requantize equivalence with the reference
merge semantics.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts.trained_parity import (
    CRC32Tokenizer,
    merge_requantize_on_device,
    stripe_targets,
)


def test_crc_tokenizer_deterministic():
    a = CRC32Tokenizer().encode("put spoon on towel")
    b = CRC32Tokenizer().encode("put spoon on towel")
    assert a == b and a[0] == 1
    # crc32 is process-independent (unlike hash()); pin a golden value so a
    # library change cannot silently retokenize the trained prompt
    import zlib

    assert a[1] == (zlib.crc32(b"put") % 30000) + 1000


def test_stripe_targets_structure():
    g = np.random.default_rng(0)
    imgs = g.integers(0, 256, (6, 32, 64, 3), np.uint8)
    t = stripe_targets(imgs, vocab_size=32000)
    assert t.shape == (6, 7)
    # tokens live in the action range, centered on 16 well-separated levels
    bins = 32000 - t
    assert bins.min() >= 8 and bins.max() <= 248
    assert set(np.unique((bins - 8) % 16)) == {0}
    # deterministic + image-dependent
    np.testing.assert_array_equal(t, stripe_targets(imgs, 32000))
    solid0 = np.zeros((1, 32, 64, 3), np.uint8)
    solid255 = np.full((1, 32, 64, 3), 255, np.uint8)
    assert (stripe_targets(solid0, 32000) != stripe_targets(solid255, 32000)).all()


def test_merge_requantize_matches_merge_lora():
    """On-device leaf-wise merge+requantize == the reference merge semantics
    (merge_lora on a quantized base: dequant + scale*B@A in fp32, requantize),
    for stacked, flat-quantized, and plain adapted leaves."""
    from openvla_probe_tpu.ops.linear import quantize_weight
    from openvla_probe_tpu.training import lora

    g = np.random.default_rng(0)
    base = {
        "layers": {  # stacked quantized leaf [L, out, in]
            "q_proj": quantize_weight(jnp.asarray(g.standard_normal((3, 16, 24)), jnp.float32)),
        },
        "lm_head": quantize_weight(jnp.asarray(g.standard_normal((32, 24)), jnp.float32)),
        "proj": {"w": jnp.asarray(g.standard_normal((8, 24)), jnp.float32)},
        "norm": jnp.asarray(g.standard_normal(24), jnp.float32),   # untouched
    }
    lcfg = lora.LoRAConfig(r=4, include_lm_head=True)
    adapters = lora.init_lora_params(base, lcfg, jax.random.key(0))
    # give B nonzero values so the merge actually changes weights (None
    # nodes are empty subtrees for tree.map, so only A/B arrays shift)
    adapters = jax.tree.map(lambda x: x + 0.1, adapters)

    want = lora.merge_lora(base, adapters, lcfg)
    holder = [jax.tree.map(lambda x: x, base), adapters]
    got = merge_requantize_on_device(holder, lcfg)
    assert holder == []   # inputs relinquished (the HBM-peak contract)

    flat_w = jax.tree.leaves(want)
    flat_g = jax.tree.leaves(got)
    assert len(flat_w) == len(flat_g)
    for w, gl in zip(flat_w, flat_g):
        np.testing.assert_allclose(np.asarray(w, np.float32),
                                   np.asarray(gl, np.float32),
                                   atol=2e-2, rtol=2e-2)
    # quantized leaves stay quantized
    assert set(got["layers"]["q_proj"].keys()) == {"q", "s"}
    assert got["layers"]["q_proj"]["q"].dtype == jnp.int8


def test_merge_requantize_mix_mode():
    """bits="mix": both copies quantize from the SAME merged fp32 weights —
    q/s bit-match the bits=8 merge, q4/s4 bit-match quantize_weight_int4 of
    the merged fp32 (= load_vla(quantize_bits="mix")'s relation to bf16)."""
    from openvla_probe_tpu.ops.linear import (
        dequantize_weight, is_mixed_quant, quantize_weight, quantize_weight_int4)
    from openvla_probe_tpu.training import lora

    g = np.random.default_rng(1)
    base = {
        "layers": {
            "q_proj": quantize_weight(jnp.asarray(
                g.standard_normal((2, 16, 128)), jnp.float32)),
        },
        "lm_head": quantize_weight(jnp.asarray(
            g.standard_normal((32, 128)), jnp.float32)),
    }
    lcfg = lora.LoRAConfig(r=4, include_lm_head=True)
    adapters = lora.init_lora_params(base, lcfg, jax.random.key(0))
    adapters = jax.tree.map(lambda x: x + 0.1, adapters)

    copy = lambda t: jax.tree.map(lambda x: x, t)
    got8 = merge_requantize_on_device([copy(base), copy(adapters)], lcfg, bits=8)
    gotm = merge_requantize_on_device([copy(base), copy(adapters)], lcfg, bits="mix")

    # reconstruct the merged fp32 weights exactly as merge_q computes them
    def wf_of(qw, ab):
        return np.asarray(
            qw["q"].astype(jnp.float32) * qw["s"][..., None].astype(jnp.float32)
            + lcfg.scaling * (ab["B"].astype(jnp.float32)
                              @ ab["A"].astype(jnp.float32)), np.float32)

    wfs = {("layers", "q_proj"): wf_of(base["layers"]["q_proj"],
                                       adapters["layers"]["q_proj"]),
           ("lm_head",): wf_of(base["lm_head"], adapters["lm_head"])}
    for path, wf in wfs.items():
        m8, mm = got8, gotm
        for k in path:
            m8, mm = m8[k], mm[k]
        assert is_mixed_quant(mm), path
        np.testing.assert_array_equal(np.asarray(mm["q"]), np.asarray(m8["q"]))
        np.testing.assert_array_equal(np.asarray(mm["s"]), np.asarray(m8["s"]))
        # the int4 copy quantizes the SAME merged fp32 wf — up to one int4
        # LSB of reassociation slack between the jitted and eager wf
        w4 = quantize_weight_int4(jnp.asarray(wf))
        d_mm = np.asarray(dequantize_weight({"q": mm["q4"], "s": mm["s4"]},
                                            jnp.float32), np.float32)
        d_w4 = np.asarray(dequantize_weight(w4, jnp.float32), np.float32)
        lsb4 = float(np.abs(np.asarray(mm["s4"], np.float32)).max())
        np.testing.assert_allclose(d_mm, d_w4, atol=1.01 * lsb4 + 1e-6)
