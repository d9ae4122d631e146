"""Multi-adapter LoRA serving (models/multilora.py).

N finetuned adapters share one frozen base; a per-example one-hot `sel`
picks each request row's adapter inside ONE batched jit. The reference's
deployment unit is one merged checkpoint per task (vla-scripts/finetune.py:
326-361), so this whole capability is beyond-reference; these tests pin:

- matmul_t multilora dispatch == single-adapter streamed LoRA per row
- row-selection semantics: mixed-adapter batches are bitwise row-equal to
  uniform-adapter batches (no cross-row leakage through the einsums)
- the -1 "no adapter" row is bitwise the bare-base serving
- the speculative path composes (correct drafts accepted fully)
- quantized (int8) bases serve under adapter banks
- OpenVLA surface: set_adapters, names, per-row mixtures, batch API
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openvla_probe_tpu.models import multilora, vla, vlm
from openvla_probe_tpu.ops.linear import matmul_t, quantize_params
from openvla_probe_tpu.training import lora


class _Tok:
    def encode(self, t):
        return [1] + [(len(w) % 300) + 3 for w in t.split()]


def _rand_lora(params, cfg, seed):
    """init_lora_params, then randomize B (init is zeros → delta would be 0)."""
    tree = lora.init_lora_params(params, cfg, jax.random.key(seed))
    leaves, treedef = jax.tree_util.tree_flatten(tree, is_leaf=lora._is_ab)
    keys = jax.random.split(jax.random.key(seed + 1000), len(leaves))
    out = []
    for leaf, k in zip(leaves, keys):
        if leaf is None:
            out.append(None)
        else:
            out.append({"A": leaf["A"],
                        "B": jax.random.normal(k, leaf["B"].shape, jnp.float32) * 0.05})
    return jax.tree_util.tree_unflatten(treedef, out)


@pytest.fixture(scope="module")
def setup():
    cfg = vlm.VLMConfig.tiny()
    serving = vla.VLAServingConfig(vlm=cfg, action_dim=5, prompt_pad_len=12,
                                   codec_vocab_size=cfg.llm.vocab_size)
    params = vlm.init_params(cfg, jax.random.key(0))
    lcfg = lora.LoRAConfig(r=4, include_lm_head=True)
    adapters = {f"task{i}": _rand_lora(params, lcfg, i) for i in range(3)}
    from openvla_probe_tpu.ops.image import BackboneTransformSpec, ImageTransformConfig

    s = cfg.vision[0].image_size
    img_cfg = ImageTransformConfig(specs=(
        BackboneTransformSpec((s, s), "bicubic", (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
        BackboneTransformSpec((s, s), "bicubic", (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)),
    ))
    stats = {"x": {"action": {"q01": -np.ones(5, np.float32),
                              "q99": np.ones(5, np.float32)}}}
    imgs = np.random.default_rng(0).integers(0, 256, (4, s, s, 3), dtype=np.uint8)
    return serving, params, lcfg, adapters, img_cfg, stats, imgs


def _wrapper(setup, params=None):
    serving, base, lcfg, adapters, img_cfg, stats, _ = setup
    m = vla.OpenVLA(params if params is not None else base,
                    serving, _Tok(), stats, img_cfg)
    return m


# --- ops-level dispatch -------------------------------------------------------

def test_matmul_t_multilora_matches_single_adapter():
    rng = np.random.default_rng(0)
    Bex, T, K, O, r, N = 3, 5, 16, 8, 2, 4
    x = jnp.asarray(rng.normal(size=(Bex, T, K)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(O, K)), jnp.float32)
    A = jnp.asarray(rng.normal(size=(N, r, K)), jnp.float32)
    Bw = jnp.asarray(rng.normal(size=(N, O, r)), jnp.float32)
    Bt = jnp.swapaxes(Bw, -1, -2)
    ids = np.array([2, 0, 3])
    sel = multilora.adapter_one_hot(ids, N)
    got = matmul_t(x, {"base": w, "A": A, "Bt": Bt, "sel": sel})
    for b, i in enumerate(ids):
        want = matmul_t(x[b:b + 1], {"base": w, "A": A[i], "B": Bw[i]})
        np.testing.assert_allclose(np.asarray(got[b:b + 1]), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_matmul_t_multilora_zero_row_is_base():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 3, 16)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
    A = jnp.asarray(rng.normal(size=(2, 4, 16)), jnp.float32)
    Bt = jnp.asarray(rng.normal(size=(2, 4, 8)), jnp.float32)
    sel = multilora.adapter_one_hot(np.array([-1, -1]), 2)
    got = matmul_t(x, {"base": w, "A": A, "Bt": Bt, "sel": sel})
    # within ONE formulation the masked delta is exactly 0.0 per term, and
    # eager matmul_t(x, w) is the same base dot — bitwise here (cross-GRAPH
    # bitwise equality is NOT promised; XLA may fuse the base matmul
    # differently when the delta path rides along — module docstring)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(matmul_t(x, w)))


def test_adapter_one_hot_validation():
    oh = multilora.adapter_one_hot(1, 3, batch=2)
    np.testing.assert_array_equal(np.asarray(oh), [[0, 1, 0], [0, 1, 0]])
    with pytest.raises(ValueError, match="batch"):
        multilora.adapter_one_hot(1, 3)
    with pytest.raises(ValueError, match="scalar or"):
        multilora.adapter_one_hot(np.zeros((2, 2), np.int32), 3)


# --- bank construction --------------------------------------------------------

def test_stack_banks_shapes_and_scale(setup):
    _, params, lcfg, adapters, *_ = setup
    bank = multilora.stack_adapter_banks(list(adapters.values()), lcfg)
    # llm trunk leaves are layer-stacked: A [L, N, r, I], Bt [L, N, r, O]
    qa = bank["llm"]["layers"]["q_proj"]
    L = params["llm"]["layers"]["q_proj"].shape[0]
    assert qa["A"].shape[:2] == (L, 3) and qa["A"].shape[2] == lcfg.r
    assert qa["Bt"].shape[:2] == (L, 3) and qa["Bt"].shape[-2] == lcfg.r
    # scaling folded into the stored (pre-transposed) Bt
    a0 = list(adapters.values())[0]["llm"]["layers"]["q_proj"]["B"]
    np.testing.assert_allclose(
        np.asarray(qa["Bt"][:, 0].astype(jnp.float32)),
        np.asarray((jnp.swapaxes(a0, -1, -2) * lcfg.scaling)
                   .astype(jnp.bfloat16).astype(jnp.float32)))
    # lm_head is a flat leaf: [N, r, D]
    assert bank["llm"]["lm_head"]["A"].shape[0] == 3
    with pytest.raises(ValueError, match="at least one"):
        multilora.stack_adapter_banks([], lcfg)


# --- serving semantics --------------------------------------------------------

def test_serving_zero_row_equals_base(setup):
    serving, params, lcfg, adapters, img_cfg, stats, imgs = setup
    m = _wrapper(setup)
    m.set_adapters(adapters, lcfg)
    base_out = m.predict_action(imgs[:2], "pick the mug", unnorm_key="x")
    ml_out = m.predict_action(imgs[:2], "pick the mug", unnorm_key="x",
                              adapter=[None, None])
    np.testing.assert_array_equal(ml_out["action_tokens"], base_out["action_tokens"])
    np.testing.assert_array_equal(ml_out["actions"], base_out["actions"])


def test_serving_mixed_rows_equal_uniform_rows(setup):
    """Row b of a mixed-adapter batch is bitwise row b of a uniform batch:
    selection cannot leak across rows."""
    serving, params, lcfg, adapters, img_cfg, stats, imgs = setup
    m = _wrapper(setup)
    m.set_adapters(adapters, lcfg)
    mixed = m.predict_action(imgs, "pick the mug", unnorm_key="x",
                             adapter=["task0", "task1", "task2", "task0"])
    for i, name in enumerate(["task0", "task1", "task2"]):
        uni = m.predict_action(imgs, "pick the mug", unnorm_key="x", adapter=name)
        np.testing.assert_array_equal(mixed["action_tokens"][i],
                                      uni["action_tokens"][i])
    # and the two task0 rows see different images → rows 0 and 3 come from
    # the same adapter but need not match each other
    assert mixed["action_tokens"].shape == (4, 5)


def test_serving_matches_single_adapter_stream(setup):
    """Multi-LoRA row == attach_lora single-adapter serving (same math,
    modulo bf16 reduction dust → compare fp32 first logits, loose tol)."""
    serving, params, lcfg, adapters, img_cfg, stats, imgs = setup
    m = _wrapper(setup)
    m.set_adapters(adapters, lcfg)
    got = m.predict_action(imgs[:2], "pick the mug", unnorm_key="x",
                           adapter="task1", return_first_logits=True)
    single = vla.OpenVLA(lora.attach_lora(params, adapters["task1"], lcfg),
                         serving, _Tok(), stats, img_cfg)
    want = single.predict_action(imgs[:2], "pick the mug", unnorm_key="x",
                                 return_first_logits=True)
    np.testing.assert_allclose(got["first_logits"], want["first_logits"],
                               rtol=0.05, atol=0.05)
    # the adapters must actually DO something vs the base
    base = m.predict_action(imgs[:2], "pick the mug", unnorm_key="x",
                            return_first_logits=True)
    assert float(np.abs(got["first_logits"] - base["first_logits"]).max()) > 1e-3


def test_serving_speculative_composes(setup):
    serving, params, lcfg, adapters, img_cfg, stats, imgs = setup
    import dataclasses

    m = vla.OpenVLA(params,
                    dataclasses.replace(serving, speculative_in_parity="allow"),
                    _Tok(), stats, img_cfg)
    m.set_adapters(adapters, lcfg)
    seq = m.predict_action(imgs[:2], "pick the mug", unnorm_key="x",
                           adapter=["task0", "task2"])
    spec = m.predict_action(imgs[:2], "pick the mug", unnorm_key="x",
                            adapter=["task0", "task2"],
                            draft_tokens=seq["action_tokens"])
    # correct drafts: verified speculation must reproduce the sequential
    # tokens (per-position greedy equality is its acceptance rule)
    np.testing.assert_array_equal(spec["action_tokens"], seq["action_tokens"])
    assert int(spec["n_accepted"].min()) >= 0


def test_serving_quantized_base(setup):
    serving, params, lcfg, adapters, img_cfg, stats, imgs = setup
    qparams = quantize_params({**params})
    m = vla.OpenVLA(qparams, serving, _Tok(), stats, img_cfg)
    m.set_adapters(adapters, lcfg)
    base_out = m.predict_action(imgs[:2], "pick the mug", unnorm_key="x")
    ml = m.predict_action(imgs[:2], "pick the mug", unnorm_key="x",
                          adapter=[None, "task2"])
    # zero row rides the int8 base bit-exactly; adapter row diverges
    np.testing.assert_array_equal(ml["action_tokens"][0], base_out["action_tokens"][0])
    assert ml["action_tokens"].shape == (2, 5)


@pytest.mark.parametrize("bits", [4, "mix"])
def test_serving_int4_and_mix_bases(setup, bits):
    """Adapter banks compose with EVERY quantized base matmul_t serves —
    grouped int4 and dual-precision mix included (module docstring claim)."""
    serving, params, lcfg, adapters, img_cfg, stats, imgs = setup
    qparams = quantize_params({**params}, bits=bits, group_size=32)
    m = vla.OpenVLA(qparams, serving, _Tok(), stats, img_cfg)
    m.set_adapters(adapters, lcfg)
    base_out = m.predict_action(imgs[:2], "pick the mug", unnorm_key="x")
    ml = m.predict_action(imgs[:2], "pick the mug", unnorm_key="x",
                          adapter=[None, "task2"])
    # zero row rides the quantized base bit-exactly; adapter row diverges
    np.testing.assert_array_equal(ml["action_tokens"][0], base_out["action_tokens"][0])
    assert ml["action_tokens"].shape == (2, 5)


def test_batch_api_per_row_adapters(setup):
    serving, params, lcfg, adapters, img_cfg, stats, imgs = setup
    m = _wrapper(setup)
    m.set_adapters(adapters, lcfg)
    res = m.predict_action_batch(
        imgs[:3], ["pick the mug", "open the drawer", "press the button"],
        unnorm_keys=["x", "x", "x"], adapters=["task0", None, "task2"])
    assert len(res) == 3 and all(r["action_tokens"].shape == (5,) for r in res)
    # row 1 (no adapter) must equal the adapter-free batch path
    plain = m.predict_action_batch(
        imgs[:3], ["pick the mug", "open the drawer", "press the button"],
        unnorm_keys=["x", "x", "x"])
    np.testing.assert_array_equal(res[1]["action_tokens"], plain[1]["action_tokens"])


def test_adapter_resolution_errors(setup):
    serving, params, lcfg, adapters, img_cfg, stats, imgs = setup
    m = _wrapper(setup)
    with pytest.raises(ValueError, match="set_adapters"):
        m.predict_action(imgs[:1], "x", unnorm_key="x", adapter="task0")
    m.set_adapters(adapters, lcfg)
    with pytest.raises(ValueError, match="unknown adapter"):
        m.predict_action(imgs[:1], "x", unnorm_key="x", adapter="nope")
    with pytest.raises(ValueError, match="out of range"):
        m.predict_action(imgs[:1], "x", unnorm_key="x", adapter=7)
    with pytest.raises(ValueError, match="one adapter per request row"):
        m.predict_action(imgs[:2], "x", unnorm_key="x", adapter=["task0"])
    assert m.n_adapters == 3 and m.adapter_names == ["task0", "task1", "task2"]


# --- serving-stack pass-through -------------------------------------------

def test_infer_lora_config(setup):
    _, _, lcfg, adapters, *_ = setup
    got = multilora.infer_lora_config(adapters["task0"])
    assert got.r == lcfg.r and got.include_lm_head and not got.include_embeddings


def test_adapter_checkpoint_roundtrip(setup, tmp_path):
    _, _, _, adapters, *_ = setup
    from openvla_probe_tpu.training import checkpointing as ckpt

    tree = adapters["task1"]
    # finetune.py's periodic layout: {"lora", "opt_state"} pair in a run dir
    ckpt.save_checkpoint(tmp_path, {"lora": tree, "opt_state": {"t": jnp.zeros(3)}},
                         step=7)
    back = multilora.load_adapter_checkpoint(tmp_path)
    want = jax.tree_util.tree_leaves(tree)
    got = jax.tree_util.tree_leaves(back)
    assert len(want) == len(got)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))


class _AdapterBatchStub:
    """Records the adapters kwarg the batcher forwards."""

    def __init__(self):
        self.calls = []

    def predict_action_batch(self, images, prompts, unnorm_keys=None, **kw):
        self.calls.append(kw.get("adapters"))
        return [{"actions": np.zeros(7, np.float32)} for _ in prompts]


def test_batcher_forwards_adapters():
    from openvla_probe_tpu.serving.batcher import DynamicBatcher

    stub = _AdapterBatchStub()
    b = DynamicBatcher(stub, max_batch=4, max_wait_ms=5.0)
    try:
        b.predict_action(np.zeros((8, 8, 3), np.uint8), "p", adapter="taskA")
        b.predict_action(np.zeros((8, 8, 3), np.uint8), "p")  # plain
    finally:
        b.shutdown()
    flat = [a for call in stub.calls for a in (call or [])]
    assert "taskA" in flat                       # adapter rode through
    assert any(c is None for c in stub.calls)    # all-plain group stays plain


def test_server_payload_adapter(setup):
    from openvla_probe_tpu.serving.server import OpenVLAServer, get_openvla_prompt

    import dataclasses

    serving, params, lcfg, adapters, img_cfg, stats, imgs = setup
    # the full deploy prompt template needs a wider pad bucket than the
    # module fixture's 12
    m = vla.OpenVLA(params, dataclasses.replace(serving, prompt_pad_len=24),
                    _Tok(), stats, img_cfg)
    m.set_adapters(adapters, lcfg)
    srv = OpenVLAServer(m, dynamic_batching=False, speculative_streams=False)
    payload = {"image": imgs[0], "instruction": "pick the mug",
               "unnorm_key": "x", "adapter": "task2"}
    out = srv.predict_action(payload)
    want = m.predict_action(imgs[0], get_openvla_prompt("pick the mug"),
                            unnorm_key="x", adapter="task2")
    np.testing.assert_array_equal(out["action"], want["actions"])


# --- tp/dp sharded multi-LoRA serving -----------------------------------------

def test_bank_param_specs_follow_base_layout():
    """Bank factors shard WITH the base (parallel.sharding tp rules): an
    out-sharded base shards Bt's O, a contraction-sharded base shards A's I;
    the rank/N dims never shard. 7B-like shapes, pure spec check."""
    from jax.sharding import PartitionSpec as P

    from openvla_probe_tpu.parallel.mesh import make_mesh
    from openvla_probe_tpu.parallel.sharding import param_spec

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh({"dp": 4, "fsdp": 1, "tp": 2})

    def axes(path, shape):
        spec = param_spec(path, shape, mesh, "tp")
        return tuple(spec) + (None,) * (len(shape) - len(spec))

    # q_proj is out-sharded: A replicated, Bt splits O
    assert "tp" not in axes("llm/layers/q_proj/A", (32, 4, 32, 4096))
    assert axes("llm/layers/q_proj/Bt", (32, 4, 32, 4096))[-1] == "tp"
    # down_proj is contraction-sharded: A splits I, Bt replicated
    assert axes("llm/layers/down_proj/A", (32, 4, 32, 11008))[-1] == "tp"
    assert "tp" not in axes("llm/layers/down_proj/Bt", (32, 4, 32, 4096))
    # streamed-LoRA B [L, O, r] splits O for out-sharded bases
    assert axes("llm/layers/q_proj/B", (32, 4096, 32))[1] == "tp"


def test_sharded_multilora_matches_unsharded(setup):
    """make_sharded_multilora_predict under a dp2/tp2 mesh: greedy tokens
    equal the single-device multi-LoRA run, with bank leaves actually
    sharded (the delta path rides the base's collectives)."""
    import functools

    from openvla_probe_tpu.parallel.mesh import make_mesh

    serving, params, lcfg, _, img_cfg, stats, imgs = setup
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    # r=8 / N=4 puts the ffn bank factors over MIN_SHARD_ELEMS so the tp
    # rule is exercised, not just vacuously replicated
    lcfg8 = lora.LoRAConfig(r=8, include_lm_head=True)
    trees = [_rand_lora(params, lcfg8, 50 + i) for i in range(4)]
    bank = multilora.stack_adapter_banks(trees, lcfg8)
    B = imgs.shape[0]
    P_len = serving.prompt_pad_len
    r = np.random.default_rng(3)
    ids = np.zeros((B, P_len), np.int32)
    ids[:, 0] = 1
    ids[:, 1:7] = r.integers(3, 500, (B, 6))
    args = dict(
        image_u8=imgs, input_ids=ids,
        prompt_len=np.full((B,), 7, np.int32),
        q01=-np.ones(5, np.float32), q99=np.ones(5, np.float32),
        action_mask=np.array([True] * 4 + [False]),
    )
    sel = multilora.adapter_one_hot(np.array([0, 3, -1, 2]), 4)

    def serve(p, bank, sel, **kw):
        adapted = multilora.attach_multilora(p, bank, sel)
        return vla.predict_action_from_image(adapted, serving,
                                             kw.pop("image_u8"), img_cfg, **kw)

    want = jax.jit(serve)(params, bank, sel,
                          **{k: jnp.asarray(v) for k, v in args.items()})
    want_toks = np.asarray(want["action_tokens"])

    mesh = make_mesh({"dp": 4, "fsdp": 1, "tp": 2})
    call, sp, sb = vla.make_sharded_multilora_predict(
        params, bank, serving, mesh, image_cfg=img_cfg, strategy="tp")
    out = call(sp, sb, sel, args["image_u8"], args["input_ids"],
               args["prompt_len"], args["q01"], args["q99"], args["action_mask"])
    np.testing.assert_array_equal(np.asarray(out["action_tokens"]), want_toks)
    assert any(not l.sharding.is_fully_replicated for l in jax.tree.leaves(sb))


def test_adapter_hot_swap_reuses_graph(setup):
    """set_adapters with a same-geometry bank (same N, r, targets) serves new
    weights through the SAME compiled graph (the bank is a jit argument, not
    a constant); a different N recompiles. Fleet ops can rotate task adapters
    without a serving pause."""
    serving, params, lcfg, adapters, img_cfg, stats, imgs = setup
    m = _wrapper(setup)
    m.set_adapters(adapters, lcfg)
    out0 = m.predict_action(imgs[:2], "pick the mug", unnorm_key="x",
                            adapter="task1")
    n_graphs = len(m._jit_cache)
    # swap in freshly-initialized banks of the SAME geometry
    swapped = {f"task{i}": _rand_lora(params, lcfg, 70 + i) for i in range(3)}
    m.set_adapters(swapped, lcfg)
    out1 = m.predict_action(imgs[:2], "pick the mug", unnorm_key="x",
                            adapter="task1")
    assert len(m._jit_cache) == n_graphs          # no recompile
    assert (out0["action_tokens"] != out1["action_tokens"]).any()  # new weights
    # a 2-adapter bank is a new sel geometry: still served (new graph)
    m.set_adapters({k: swapped[k] for k in ("task0", "task1")}, lcfg)
    out2 = m.predict_action(imgs[:2], "pick the mug", unnorm_key="x",
                            adapter="task1")
    assert out2["action_tokens"].shape == (2, 5)
