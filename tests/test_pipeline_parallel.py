"""Pipeline parallelism: GPipe trunk schedule == plain forward; dp x pp step.

The pp axis is beyond the reference (SURVEY.md §2.5: no TP/PP of any kind).
Correctness contract: pipelined logits equal the plain stacked-scan forward,
and a dp x pp train step produces the same loss/updated params as the
unsharded baseline step.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.experimental.shard_map import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from openvla_probe_tpu.models import llama, vlm
from openvla_probe_tpu.models.vit import ViTConfig
from openvla_probe_tpu.parallel.mesh import make_mesh
from openvla_probe_tpu.parallel.pipeline import (
    _pp_spec_tree,
    llama_forward_pipelined,
    make_pipeline_train_step,
)

pytestmark = pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")


def _llm_cfg():
    return llama.LlamaConfig.tiny(num_hidden_layers=4)


@pytest.mark.parametrize("pp,n_micro", [(2, 2), (4, 2), (2, 4)])
def test_pipelined_forward_matches_plain(pp, n_micro):
    cfg = _llm_cfg()
    params = llama.init_params(cfg, jax.random.key(0))
    r = np.random.default_rng(0)
    B, T = 4, 10
    ids = jnp.asarray(r.integers(3, 500, (B, T)), jnp.int32)
    embeds = llama.embed_tokens(params, ids)
    mask = jnp.ones((B, T), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(T), (B, T))

    want = np.asarray(llama.forward(params, cfg, embeds, mask, pos)["logits"])

    mesh = make_mesh({"dp": 8 // pp, "pp": pp})
    pspecs = _pp_spec_tree(params, "pp")

    def run(p, e, m, po):
        return llama_forward_pipelined(p, cfg, e, m, po, n_micro=n_micro)

    fn = shard_map(run, mesh=mesh,
                   in_specs=(pspecs, P(), P(), P()),
                   out_specs=P(), check_rep=False)
    placed = jax.device_put(
        params, jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs,
                             is_leaf=lambda x: isinstance(x, P)))
    got = np.asarray(jax.jit(fn)(placed, embeds, mask, pos))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def _vlm_setup():
    cfg = vlm.VLMConfig(
        llm=_llm_cfg(),
        vision=(ViTConfig.tiny(num_register_tokens=4, no_embed_class=True), ViTConfig.tiny()),
        vision_names=("dino", "siglip"),
        arch_specifier="no-align+fused-gelu-mlp",
    )
    params = vlm.init_params(cfg, jax.random.key(1))
    r = np.random.default_rng(2)
    B, T, S = 4, 12, cfg.vision[0].image_size
    labels = np.full((B, T), -100, np.int64)
    labels[:, -6:] = r.integers(cfg.llm.vocab_size - 256, cfg.llm.vocab_size, (B, 6))
    batch = {
        "input_ids": jnp.asarray(r.integers(2, 500, (B, T)), jnp.int32),
        "attention_mask": jnp.ones((B, T), jnp.int32),
        "pixel_values": jnp.asarray(r.normal(size=(B, 6, S, S)), jnp.float32),
        "labels": jnp.asarray(labels),
    }
    return cfg, params, batch


def test_pp_dp_train_step_matches_baseline():
    cfg, params, batch = _vlm_setup()
    optimizer = optax.sgd(1e-2)  # linear in grads: clean equivalence check

    # --- baseline: unsharded step -----------------------------------------
    from openvla_probe_tpu.training.train_step import cross_entropy_loss

    def base_loss(p):
        out = vlm.forward(p, cfg, batch["input_ids"], batch["attention_mask"],
                          batch["pixel_values"], batch["labels"])
        return cross_entropy_loss(out["logits"], out["labels"])

    loss0, grads0 = jax.value_and_grad(base_loss)(params)
    upd0, _ = optimizer.update(grads0, optimizer.init(params), params)
    want_params = jax.tree.map(lambda p, u: p + u, params, upd0)

    # --- dp=2 x pp=4 pipeline step ------------------------------------------
    mesh = make_mesh({"dp": 2, "pp": 4})
    place_state, step_fn = make_pipeline_train_step(cfg, optimizer, mesh, n_micro=2)
    from openvla_probe_tpu.training.train_state import TrainState

    state = place_state(TrainState.create(params, optimizer))
    new_state, metrics = step_fn(state, batch)

    np.testing.assert_allclose(float(metrics["loss"]), float(loss0), atol=1e-5)
    flat_w, _ = jax.tree_util.tree_flatten_with_path(want_params)
    flat_g = dict(jax.tree_util.tree_flatten_with_path(new_state.params)[0])
    for path, w in flat_w:
        g = np.asarray(flat_g[path])
        np.testing.assert_allclose(
            g, np.asarray(w), atol=3e-5, rtol=1e-4,
            err_msg=f"param mismatch at {jax.tree_util.keystr(path)}",
        )
    assert int(jax.device_get(new_state.step)) == 1
