"""Concat-fused multi-LoRA (VERDICT r4 #3a) + einsum A/B variant (#3b).

The fused form folds each A bank's N*r rank rows onto the base weight's
output rows offline, so serving pays ONE widened dot per target. Contracts
pinned here (CPU, tiny shapes):

  * int8 base: the first O output rows are BITWISE the plain base matmul
    (int32 accumulation is exact — widening O cannot perturb them), so a
    sel=-1 (bare-base) row is unchanged by construction;
  * the fused delta matches the masked-form delta to int8-quantization
    tolerance (the A rows ride the base's w8a8 representation);
  * bf16 base: fused delta matches masked delta to bf16 dust;
  * the einsum impl (sel folded into the contraction) matches masked
    exactly in structure-independent math.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openvla_probe_tpu.models import multilora
from openvla_probe_tpu.ops import linear
from openvla_probe_tpu.training.lora import LoRAConfig

N, R, O, K, B, T = 3, 4, 32, 64, 4, 5


@pytest.fixture(scope="module")
def setup():
    key = jax.random.key(0)
    ks = jax.random.split(key, 8)
    w = jax.random.normal(ks[0], (O, K), jnp.float32) * 0.05
    adapters = []
    for i in range(N):
        adapters.append({"t": {
            "A": jax.random.normal(ks[1 + i], (R, K), jnp.float32) * 0.05,
            "B": jax.random.normal(ks[4 + i], (O, R), jnp.float32) * 0.05,
        }})
    cfg = LoRAConfig(r=R)
    bank = multilora.stack_adapter_banks(adapters, cfg, dtype=jnp.float32)
    x = jax.random.normal(ks[7], (B, T, K), jnp.float32) * 0.3
    sel = multilora.adapter_one_hot(np.array([0, 1, 2, -1]), N)
    return w, bank, x, sel


def test_int8_base_rows_bitwise_and_delta_close(setup):
    w, bank, x, sel = setup
    qw = linear.quantize_weight(w)
    params = {"t": qw}

    # plain base (w8a8 path), masked multilora, fused multilora
    base_out = linear.matmul_t(x, qw)
    masked = linear.matmul_t(
        x, {"base": qw, "A": bank["t"]["A"], "Bt": bank["t"]["Bt"], "sel": sel})
    fused_tree = multilora.fuse_bank_into_base(params, bank)
    leaf = fused_tree["t"]
    assert leaf["qf"].shape == (O + N * R, K) and leaf["sf"].shape == (O + N * R,)
    fused = linear.matmul_t(
        x, multilora.attach_multilora_fused(fused_tree, sel)["t"])

    # bare-base row (sel=-1): fused == plain base BITWISE
    np.testing.assert_array_equal(np.asarray(fused[3]), np.asarray(base_out[3]))
    # adapter rows: fused delta tracks the masked delta within int8-A tol
    d_masked = np.asarray(masked - base_out)
    d_fused = np.asarray(fused - base_out)
    scale = np.abs(d_masked).max()
    np.testing.assert_allclose(d_fused, d_masked, atol=0.03 * scale)


def test_bf16_base_fused_matches_masked(setup):
    w, bank, x, sel = setup
    params = {"t": w}
    masked = linear.matmul_t(
        x, {"base": w, "A": bank["t"]["A"], "Bt": bank["t"]["Bt"], "sel": sel})
    fused_tree = multilora.fuse_bank_into_base(params, bank)
    assert "wf" in fused_tree["t"]
    fused = linear.matmul_t(
        x, multilora.attach_multilora_fused(fused_tree, sel)["t"])
    np.testing.assert_allclose(np.asarray(fused), np.asarray(masked),
                               rtol=2e-5, atol=2e-5)


def test_einsum_impl_matches_masked(setup, monkeypatch):
    w, bank, x, sel = setup
    ml = {"base": w, "A": bank["t"]["A"], "Bt": bank["t"]["Bt"], "sel": sel}
    masked = linear.matmul_t(x, ml)
    monkeypatch.setenv("OVLA_MULTILORA_IMPL", "einsum")
    einsum = linear.matmul_t(x, ml)
    np.testing.assert_allclose(np.asarray(einsum), np.asarray(masked),
                               rtol=2e-5, atol=2e-5)


def test_fuse_rejects_mix_base(setup):
    w, bank, _, _ = setup
    # dual-precision leaf: int8 copy + grouped-int4 copy resident together
    mixed = {"t": {**linear.quantize_weight(w),
                   **{f"{k}4" if k in ("q", "s") else k: v
                      for k, v in linear.quantize_weight_int4(
                          w, group_size=16).items()}}}
    assert "q4" in mixed["t"] and "s4" in mixed["t"]
    with pytest.raises(NotImplementedError, match="int8 and bf16"):
        multilora.fuse_bank_into_base(mixed, bank)


def _tiny_openvla(quantize=True):
    from openvla_probe_tpu.models import vla, vlm
    from openvla_probe_tpu.ops.image import (BackboneTransformSpec,
                                             ImageTransformConfig)

    cfg = vlm.VLMConfig.tiny()
    serving = vla.VLAServingConfig(vlm=cfg, action_dim=5, prompt_pad_len=12,
                                   codec_vocab_size=cfg.llm.vocab_size,
                                   tier="turbo" if quantize else "parity")
    params = vlm.init_params(cfg, jax.random.key(0))
    if quantize:
        params = {**params, "llm": linear.quantize_params(params["llm"])}
    s = cfg.vision[0].image_size
    img_cfg = ImageTransformConfig(specs=(
        BackboneTransformSpec((s, s), "bicubic", (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
        BackboneTransformSpec((s, s), "bicubic", (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)),
    ))
    stats = {"x": {"action": {"q01": -np.ones(5, np.float32),
                              "q99": np.ones(5, np.float32)}}}

    class _Tok:
        def encode(self, t):
            return [1] + [(len(w) % 300) + 3 for w in t.split()]

    return vla.OpenVLA(params, serving, _Tok(), stats, img_cfg), params, s


def _rand_adapters(params, lcfg, n):
    from openvla_probe_tpu.training import lora as _lora

    out = {}
    for i in range(n):
        t = _lora.init_lora_params(params, lcfg, jax.random.key(40 + i))
        leaves, td = jax.tree_util.tree_flatten(t, is_leaf=_lora._is_ab)
        ks = jax.random.split(jax.random.key(90 + i), len(leaves))
        out[f"t{i}"] = jax.tree_util.tree_unflatten(td, [
            None if l is None else
            {"A": l["A"], "B": jax.random.normal(k, l["B"].shape, jnp.float32) * 0.05}
            for l, k in zip(leaves, ks)])
    return out


def test_openvla_fused_install_bare_base_bitwise():
    """set_adapters(fused=True): a no-adapter request must produce BITWISE
    the plain model's tokens (base rows of the widened int8 dot are exact;
    the masked delta contributes literal zeros)."""
    from openvla_probe_tpu.training.lora import LoRAConfig

    model, params, s = _tiny_openvla()
    img = np.random.default_rng(3).integers(0, 256, (2, s, s, 3), np.uint8)
    want = model.predict_action(img, "pick it up", unnorm_key="x")

    model2, _, _ = _tiny_openvla()
    lcfg = LoRAConfig(r=4, include_lm_head=True)
    model2.set_adapters(_rand_adapters(params, lcfg, 2), lcfg, fused=True)
    assert model2.lora_bank == "fused"
    got = model2.predict_action(img, "pick it up", unnorm_key="x")
    np.testing.assert_array_equal(got["action_tokens"], want["action_tokens"])


def test_openvla_fused_install_adapter_rows_and_spec():
    from openvla_probe_tpu.training.lora import LoRAConfig

    model, params, s = _tiny_openvla()
    lcfg = LoRAConfig(r=4, include_lm_head=True)
    adapters = _rand_adapters(params, lcfg, 2)
    model.set_adapters(adapters, lcfg, fused=True)
    img = np.random.default_rng(4).integers(0, 256, (3, s, s, 3), np.uint8)

    out = model.predict_action(img, "pick it up", unnorm_key="x",
                               adapter=["t0", "t1", None])
    assert out["action_tokens"].shape == (3, 5)

    # masked-form install for comparison: per-row logits must track within
    # the int8-A quantization tolerance
    model_m, _, _ = _tiny_openvla()
    model_m.set_adapters(adapters, lcfg)
    out_f = model.predict_action(img, "pick it up", unnorm_key="x",
                                 adapter=["t0", "t1", None],
                                 return_first_logits=True)
    out_m = model_m.predict_action(img, "pick it up", unnorm_key="x",
                                   adapter=["t0", "t1", None],
                                   return_first_logits=True)
    f, m = (np.asarray(out_f["first_logits"], np.float32),
            np.asarray(out_m["first_logits"], np.float32))
    assert np.abs(f - m).max() <= 0.05 * max(np.abs(m).max(), 1.0)

    # speculative path composes with the fused install
    spec = model.predict_action(img, "pick it up", unnorm_key="x",
                                adapter=["t0", "t1", None],
                                draft_tokens=out["action_tokens"])
    np.testing.assert_array_equal(spec["action_tokens"], out["action_tokens"])


def test_fused_install_batch_api_mixed_rows():
    """predict_action_batch with a fused install: per-row adapters (incl.
    bare-base None rows) ride the fused graph — the serving-server batcher's
    code path."""
    from openvla_probe_tpu.training.lora import LoRAConfig

    model, params, s = _tiny_openvla()
    lcfg = LoRAConfig(r=4, include_lm_head=True)
    model.set_adapters(_rand_adapters(params, lcfg, 2), lcfg, fused=True)
    imgs = np.random.default_rng(7).integers(0, 256, (3, s, s, 3), np.uint8)
    results = model.predict_action_batch(
        imgs, ["pick it up"] * 3, unnorm_keys=["x"] * 3,
        adapters=["t0", None, "t1"])
    assert len(results) == 3
    for r in results:
        assert r["action_tokens"].shape == (5,)
    # no-adapters batch also rides the fused graph (bare-base rows)
    results2 = model.predict_action_batch(imgs, ["pick it up"] * 3,
                                          unnorm_keys=["x"] * 3)
    np.testing.assert_array_equal(results2[1]["action_tokens"],
                                  results[1]["action_tokens"])


def test_fused_install_rejects_reinstall():
    from openvla_probe_tpu.training.lora import LoRAConfig

    model, params, _ = _tiny_openvla()
    lcfg = LoRAConfig(r=4, include_lm_head=True)
    adapters = _rand_adapters(params, lcfg, 2)
    model.set_adapters(adapters, lcfg, fused=True)
    with pytest.raises(ValueError, match="fused=True"):
        model.set_adapters(adapters, lcfg)


def test_fused_serving_token_path_runs(setup):
    """End-to-end: fused wrapper rides a layer-stacked leaf ([L, ...]) the
    way the llama scan slices it — per-layer dicts must stay well-formed."""
    w, bank, x, sel = setup
    L = 2
    wl = jnp.stack([w, w * 1.1])
    ql = linear.quantize_weight(wl)
    bankL = {"t": {"A": jnp.broadcast_to(bank["t"]["A"], (L, N, R, K)),
                   "Bt": jnp.broadcast_to(bank["t"]["Bt"], (L, N, R, O))}}
    fused = multilora.fuse_bank_into_base({"t": ql}, bankL)
    att = multilora.attach_multilora_fused(fused, sel)["t"]
    assert att["qf"].shape == (L, O + N * R, K)
    assert att["sel"].shape == (L, B, N)

    def body(carry, leaf):
        y = linear.matmul_t(x, leaf)
        return carry + jnp.sum(y), y

    tot, ys = jax.lax.scan(body, jnp.float32(0.0), att)
    assert np.isfinite(float(tot))
    assert ys.shape == (L, B, T, O)


def test_grouped_rank_projection_matches_per_leaf(setup, monkeypatch):
    """matmul_t_grouped (VERDICT r4 #3 block-diag/batched lever): grouping
    the second dots of same-input fused targets into ONE batched dot must
    reproduce the per-leaf path — same contraction per slice, same dtype
    class — and fall back verbatim for non-fused leaves."""
    w, bank, x, sel = setup
    # three same-geometry fused targets (q/k/v-like) off the same input
    trees = []
    for fac in (1.0, 0.7, 1.3):
        t = multilora.fuse_bank_into_base(
            {"t": linear.quantize_weight(w * fac)}, bank)
        trees.append(multilora.attach_multilora_fused(t, sel)["t"])

    # the batched-dot branch is default-OFF (measured loser, PERF_r05.md) —
    # force it ON so this test covers the documented A/B lever, not the
    # fallback against itself
    monkeypatch.setenv("OVLA_MULTILORA_GROUPED", "1")
    grouped = linear.matmul_t_grouped(x, trees)
    monkeypatch.setenv("OVLA_MULTILORA_GROUPED", "0")
    per_leaf = [linear.matmul_t(x, t) for t in trees]
    monkeypatch.delenv("OVLA_MULTILORA_GROUPED")
    assert len(grouped) == 3
    for g, p in zip(grouped, per_leaf):
        np.testing.assert_allclose(np.asarray(g), np.asarray(p),
                                   rtol=1e-5, atol=1e-5)

    # fallback: plain (non-fused) leaves give bitwise the per-leaf results
    plain = [linear.quantize_weight(w), linear.quantize_weight(w * 2.0)]
    got = linear.matmul_t_grouped(x, plain)
    for g, p in zip(got, [linear.matmul_t(x, q) for q in plain]):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(p))

    # fallback: mismatched Bt geometries (GQA k/v) group nothing — build a
    # VALID fused target with half the output rows
    ks = jax.random.split(jax.random.key(9), 2 * N + 1)
    w2 = jax.random.normal(ks[0], (O // 2, K), jnp.float32) * 0.05
    adapters2 = [{"t": {
        "A": jax.random.normal(ks[1 + i], (R, K), jnp.float32) * 0.05,
        "B": jax.random.normal(ks[1 + N + i], (O // 2, R), jnp.float32) * 0.05,
    }} for i in range(N)]
    bank2 = multilora.stack_adapter_banks(
        adapters2, LoRAConfig(r=R), dtype=jnp.float32)
    t2 = multilora.fuse_bank_into_base(
        {"t": linear.quantize_weight(w2)}, bank2)
    small = multilora.attach_multilora_fused(t2, sel)["t"]
    got2 = linear.matmul_t_grouped(x, [trees[0], small])
    np.testing.assert_array_equal(np.asarray(got2[0]),
                                  np.asarray(linear.matmul_t(x, trees[0])))
    np.testing.assert_array_equal(np.asarray(got2[1]),
                                  np.asarray(linear.matmul_t(x, small)))
