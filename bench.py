#!/usr/bin/env python
"""Headline benchmark: 7-DoF predict_action calls/sec/chip at full OpenVLA-7B scale.

Runs the complete fused serving path (uint8 image -> dual-ViT DINOv2-L +
SigLIP-so400m -> projector -> Llama-2-7B prefill -> 7-token greedy decode ->
detokenize -> unnorm) with random bf16 weights (throughput is weight-value
independent) on the default JAX backend, and prints ONE JSON line.

Baseline: the reference publishes no throughput numbers
(SURVEY.md §6; verify_openvla.py only prints wall times). BASELINE.json sets
the build target at >=30 calls/s/chip on one v5e; `vs_baseline` is measured
against that target.

Env knobs: BENCH_SCALE=tiny|full|13b (tiny = smoke run; 13b = Llama-2-13B
trunk, fits one 16 GB chip in int8); BENCH_CALLS=N (default 30);
BENCH_BATCH=N (default 24) batched serving;
BENCH_QUANT=int8|int4|mix|nibble|bf16 (default nibble — the r5 headline:
ONE exact int8 trunk stored as two 4-bit planes; prefill reconstructs the
exact int8 codes in-register, decode streams only the hi plane at int4
traffic; int8-footprint residency, PERF_r05.md) — the quantized modes are
turbo serving (weight-only quantized trunk). Fidelity notes: int4 and the
nibble DECODE grid are margin-certified (>=99.1-99.8% / >=99.3% token
agreement), NOT token-exact (PARITY_r03/r05.md; README notes); nibble
PREFILL is bit-identical to the certified int8 tier by construction;
mix = dual-precision, int8 prefill + grouped-int4 decode, both copies
resident (1.5x nibble's bytes — superseded);
bf16 is the bit-parity mode; BENCH_SPECULATIVE=1 verified
draft-from-previous-step serving; BENCH_CAPTURE=1 emit all per-layer probe
taps; BENCH_ACTION_DIM=1 isolates prefill.
"""

import json
import os
import sys
import time

import numpy as np

# ---------------------------------------------------------------------------
# Global deadline + guaranteed-artifact machinery (VERDICT r3 weak #1): the
# driver runs bench under its own ~25 min budget and `timeout` kill. Round 3's
# layered stage timeouts (30 min backend wait + 35 min flash subprocess + main
# run) could exceed that, so the driver's SIGTERM landed while bench was still
# waiting — and NO JSON line was emitted (BENCH_r03.json rc=124, empty). Now:
#   - ONE global budget, BENCH_DEADLINE seconds from process start (default
#     1200); every stage sizes itself from the REMAINING budget.
#   - the artifact is emitted on EVERY exit path: success, exception, SIGTERM/
#     SIGINT (the `timeout` kill signal), or atexit — whichever fires first
#     wins; the others see _ARTIFACT_PRINTED and stay silent.
# ---------------------------------------------------------------------------
_START = time.time()
_ARTIFACT_PRINTED = False
_PENDING_ARTIFACT = None  # headline measured but bonus fields still running
_FLASH_CHILD = None       # in-flight flash subprocess (killed on SIGTERM)


def _remaining() -> float:
    budget = float(os.environ.get("BENCH_DEADLINE", "1200"))
    return budget - (time.time() - _START)


def _emit(artifact: dict) -> None:
    global _ARTIFACT_PRINTED
    if _ARTIFACT_PRINTED:
        return
    _ARTIFACT_PRINTED = True
    print(json.dumps(artifact), flush=True)


def _emit_error(reason: str) -> None:
    _emit({
        "metric": "predict_action calls/sec/chip (7-DoF @ 224px)",
        "value": 0.0, "unit": "calls/s", "vs_baseline": 0.0,
        "error": reason,
    })


def _bs1_extra(dt1_s: float, n_accepted: int) -> dict:
    """bs=1 speculative bonus fields WITH their acceptance context (VERDICT
    r4 #7): acceptance is out of 7 possible tokens and depends on trained-
    weight margins — under this bench's RANDOM weights low acceptance (~2/7)
    is expected and the p50 OVERSTATES the deployed robot loop by ~20%
    (trained-weight fleets accept 7/7 at 57.9-66 ms, PARITY_r04.md). The
    qualifiers keep the driver JSON from reading as a deployment latency."""
    return {"bs1_spec_p50_ms": round(dt1_s * 1e3, 2),
            "bs1_spec_accepted": int(n_accepted),
            "bs1_spec_accept_possible": 7,
            "random_weights": True}


def main() -> None:
    if os.environ.get("OVLA_COMPILE_CACHE"):
        from openvla_probe_tpu.utils.platform import setup_compilation_cache

        setup_compilation_cache(os.environ["OVLA_COMPILE_CACHE"])

    import jax
    import jax.numpy as jnp

    from openvla_probe_tpu.models import vla, vlm

    scale = os.environ.get("BENCH_SCALE", "full")
    n_calls = int(os.environ.get("BENCH_CALLS", "30"))
    batch = int(os.environ.get("BENCH_BATCH", "24"))
    quant = os.environ.get("BENCH_QUANT", "nibble")

    action_dim = int(os.environ.get("BENCH_ACTION_DIM", "7"))
    prompt_pad = int(os.environ.get("BENCH_PROMPT_PAD", "32"))
    if scale == "tiny":
        cfg = vlm.VLMConfig.tiny()
        serving = vla.VLAServingConfig(vlm=cfg, prompt_pad_len=16,
                                       codec_vocab_size=cfg.llm.vocab_size,
                                       action_dim=action_dim)
        img_hw = (64, 64)
    else:

        # BENCH_SCALE=13b: Llama-2-13B trunk (13 GB int8 on one 16 GB chip)
        cfg = (vlm.VLMConfig.openvla_13b() if scale == "13b"
               else vlm.VLMConfig.openvla_7b())
        # BENCH_LLM=<catalog id>: swap the trunk for any catalog LLM backbone
        # (e.g. mistral-v0.1-7b-pure — GQA 8-kv-head decode at 7B scale)
        llm_id = os.environ.get("BENCH_LLM", "")
        if llm_id:
            import dataclasses

            from openvla_probe_tpu.models.catalog import LLM_BACKBONES

            cfg = dataclasses.replace(cfg, llm=LLM_BACKBONES[llm_id]["cfg"])
        if quant in ("int8", "int4", "mix", "nibble"):
            cfg = cfg.turbo()  # THE turbo numerics (single definition in vlm)
        serving = vla.VLAServingConfig(vlm=cfg, prompt_pad_len=prompt_pad,
                                       action_dim=action_dim,
                                       tier="parity" if quant == "bf16" else "turbo")
        img_hw = (256, 256)
    # the A/B env knobs (OVLA_LEGACY_DECODE/SPLIT_PREFILL/KV_INT8/
    # DECODE_UNROLL) are config fields now; apply them once, here
    serving = serving.with_env_overrides()

    # init weights directly on device (bf16) — value-independent benchmark
    if quant in ("int8", "int4", "mix", "nibble"):
        from openvla_probe_tpu.ops.linear import (
            _DEFAULT_QUANT_SUFFIXES,
            TURBO_QUANT_SUFFIXES,
            quantize_params,
        )

        # single turbo suffix definition (ops.linear) shared with the parity
        # harnesses — the certificate must quantize what the bench serves
        suffixes = (TURBO_QUANT_SUFFIXES
                    if os.environ.get("BENCH_QUANT_VIT", "1") == "1"
                    else _DEFAULT_QUANT_SUFFIXES)
        # generate the QUANTIZED tree directly (random int8 + scales): the
        # throughput is value-independent, and init->quantize would have to
        # co-materialize a bf16 stack (5.7 GB/leaf at 13B) with the int8 tree
        from openvla_probe_tpu.ops.linear import random_params_like

        shapes = jax.eval_shape(
            lambda key: quantize_params({**vlm.init_params(cfg, key)},
                                        suffixes=suffixes,
                                        bits={"int4": 4, "mix": "mix",
                                              "nibble": "nibble"}.get(quant, 8)),
            jax.random.key(0))
        if quant in ("int4", "mix", "nibble"):
            # per-leaf eager materialization: the whole-tree codes+s4
            # co-materialization OOMs at 13B (ops.linear docstring)
            from openvla_probe_tpu.ops.linear import random_params_like_eager_int4

            params = random_params_like_eager_int4(shapes, jax.random.key(0))
        else:
            params = jax.jit(lambda key: random_params_like(shapes, key))(
                jax.random.key(0))
    else:
        params = jax.jit(lambda key: vlm.init_params(cfg, key))(jax.random.key(0))
    jax.block_until_ready(params)
    _ = np.asarray(jax.tree.leaves(params)[0].ravel()[0])  # force materialization

    if os.environ.get("BENCH_FUSE", "0") == "1":
        # serving-side weight fusion (qkv + gate_up): same bytes, fewer
        # dispatches on the decode hot path; bitwise-identical outputs
        from openvla_probe_tpu.models.llama import fuse_serving_params
        from openvla_probe_tpu.ops.linear import materialize_int4_tree

        # s4-carrying tiers (int4/mix/nibble): a fuse jit must emit int8
        # CODES and rematerialize each s4 leaf eagerly — s4 jit OUTPUTS carry
        # poisoned layout metadata (ops.linear._canonical_s4_format; the
        # consuming serving jit dies in a device_put RecursionError —
        # found by the r5 FUSE-on-nibble cell). Donation frees the unfused
        # trunk as the fused copy lands.
        fuse_shapes = jax.eval_shape(fuse_serving_params, params["llm"])

        def fuse_codes(llm):
            fused = fuse_serving_params(llm)
            return jax.tree.map(
                lambda l: l.astype(jnp.int8) if l.dtype == jnp.int4 else l,
                fused)

        raw = jax.jit(fuse_codes, donate_argnums=0)(params["llm"])
        params = {**params, "llm": materialize_int4_tree(fuse_shapes, raw)}
        jax.block_until_ready(params)

    from openvla_probe_tpu.ops.image import ImageTransformConfig

    if scale == "tiny":
        from openvla_probe_tpu.ops.image import BackboneTransformSpec

        s = cfg.vision[0].image_size
        img_cfg = ImageTransformConfig(specs=(
            BackboneTransformSpec((s, s), "bicubic", (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
            BackboneTransformSpec((s, s), "bicubic", (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)),
        ))
    else:
        img_cfg = ImageTransformConfig.dinosiglip_224()

    rng = np.random.default_rng(0)
    image = rng.integers(0, 256, size=(batch, *img_hw, 3), dtype=np.uint8)
    # "In: What action should the robot take to {instr}?\nOut:" ~= 25 tokens
    P = serving.prompt_pad_len
    prompt_len = min(26, P - 2)
    ids = np.zeros((batch, P), np.int32)
    ids[:, 0] = 1
    hi = min(20000, cfg.llm.vocab_size - 1)
    ids[:, 1:prompt_len - 1] = rng.integers(min(1000, hi - 1), hi, (batch, prompt_len - 2))
    ids[:, prompt_len - 1] = vla.EMPTY_TOKEN_ID % cfg.llm.vocab_size

    q01 = -np.ones(action_dim, np.float32)
    q99 = np.ones(action_dim, np.float32)
    mask = np.array([True] * (action_dim - 1) + [False])

    import functools

    speculative = os.environ.get("BENCH_SPECULATIVE", "0") == "1"
    # BENCH_CAPTURE=1: probe-capture serving — the same prefill also emits the
    # 33 mean-pooled per-layer hidden states (the reference pays a SECOND
    # full prefill for this, openvla_utils.py:188-203)
    capture = os.environ.get("BENCH_CAPTURE", "0") == "1"
    if speculative:
        # robot-control-loop steady state: the previous step's tokens are the
        # draft; identical frames => full acceptance => the sequential decode
        # while_loop runs ZERO iterations (token-exact by construction)
        from openvla_probe_tpu.ops.image import apply_image_transform

        def spec_fn(params, image_u8, input_ids, prompt_len, draft_tokens,
                    q01, q99, action_mask):
            pixels = apply_image_transform(image_u8, img_cfg).astype(cfg.llm.dtype)
            return vla.predict_action_speculative_core(
                params, serving, pixels, input_ids, prompt_len, draft_tokens,
                q01, q99, action_mask, collect_hidden_states=capture)

        fn = jax.jit(spec_fn)
    else:
        fn = jax.jit(functools.partial(
            vla.predict_action_from_image, cfg=serving, image_cfg=img_cfg,
            collect_hidden_states=capture))
    args = dict(
        image_u8=jnp.asarray(image),
        input_ids=jnp.asarray(ids),
        prompt_len=jnp.full((batch,), prompt_len, jnp.int32),
        q01=jnp.asarray(q01), q99=jnp.asarray(q99), action_mask=jnp.asarray(mask),
    )
    if speculative:
        base = jax.jit(functools.partial(
            vla.predict_action_from_image, cfg=serving, image_cfg=img_cfg))
        true_toks = base(params, **args)["action_tokens"]
        args["draft_tokens"] = jnp.asarray(np.asarray(true_toks), jnp.int32)

    # NOTE: fetch real values (np.asarray), not just block_until_ready — on
    # tunneled backends only a host transfer reliably waits for execution.
    t0 = time.time()
    out = fn(params, **args)
    _ = np.asarray(out["action_tokens"])
    compile_s = time.time() - t0

    # warmup + timed steady state; device executes enqueued programs in order,
    # so fetching the final output's value bounds the whole batch of calls
    for _ in range(3):
        _ = np.asarray(fn(params, **args)["action_tokens"])
    # BENCH_PROFILE=<dir>: wrap the timed loop in a jax.profiler trace —
    # device-side XLA op timings DO come through the tunneled backend
    # (PERF_r03.md), so this is the per-fusion accounting tool
    import contextlib

    prof_dir = os.environ.get("BENCH_PROFILE", "")
    ctx = jax.profiler.trace(prof_dir) if prof_dir else contextlib.nullcontext()
    with ctx:
        t0 = time.time()
        for _ in range(n_calls):
            out = fn(params, **args)
        _ = np.asarray(out["action_tokens"])
        dt = (time.time() - t0) / n_calls

    calls_per_s = batch / dt

    # the headline is now measured: stash it so the SIGTERM/atexit path emits
    # THIS number (without the bs=1 bonus fields) rather than an error
    # artifact if the driver's deadline lands during the bs=1 extra below
    global _PENDING_ARTIFACT
    _PENDING_ARTIFACT = {
        "metric": "predict_action calls/sec/chip (7-DoF @ 224px)",
        "value": round(calls_per_s, 3),
        "unit": "calls/s",
        "vs_baseline": round(calls_per_s / 30.0, 3),
        "p50_latency_ms": round(dt * 1e3, 2),
        "batch": batch,
        "quant": quant,
        "compile_s": round(compile_s, 1),
        "scale": scale,
        "backend": jax.default_backend(),
        **({"speculative": True,
            "n_accepted": int(np.asarray(out["n_accepted"])[0])} if speculative else {}),
        **({"capture": True} if capture else {}),
    }

    # bs=1 speculative robot-loop point (BENCH_BS1=0 to skip): rides every
    # BENCH artifact next to the throughput point, so the latency story isn't
    # only in the README table. Draft = the model's own row-0 tokens (the
    # steady-state full-acceptance operating mode).
    extra = {}
    # the bs=1 point is a bonus: skip it unless the global deadline still
    # fits its worst-case cold compile (~8 min tunneled; cached it's
    # seconds) — the headline number must reach the artifact regardless,
    # and a run that would be SIGTERM'd mid-bonus should not start it
    if (scale != "tiny" and not speculative and not capture
            and action_dim == 7 and os.environ.get("BENCH_BS1", "1") == "1"
            and _remaining() > (60 if compile_s < 60 else 510)):
        from openvla_probe_tpu.ops.image import apply_image_transform

        def spec1(params, image_u8, input_ids, prompt_len, draft_tokens,
                  q01, q99, action_mask):
            pixels = apply_image_transform(image_u8, img_cfg).astype(cfg.llm.dtype)
            return vla.predict_action_speculative_core(
                params, serving, pixels, input_ids, prompt_len, draft_tokens,
                q01, q99, action_mask)

        spec1_fn = jax.jit(spec1)
        # slice ONLY the batch-dim inputs: q01/q99/action_mask are [7]
        # per-action-dim vectors (a [:1] slice would broadcast dim 0's
        # bounds over all dims and drop the gripper's mask=False)
        args1 = dict(args)
        for key in ("image_u8", "input_ids", "prompt_len"):
            args1[key] = args1[key][:1]
        args1["draft_tokens"] = jnp.asarray(
            np.asarray(out["action_tokens"])[:1], jnp.int32)
        # steady state = draft is the bs=1 model's OWN previous output, not
        # the batched run's row 0 (batched-vs-bs1 matmul reduction orders
        # disagree at random-weight margins, which would understate
        # acceptance and time the sequential-tail path instead)
        toks1 = np.asarray(spec1_fn(params, **args1)["action_tokens"])  # compile
        args1["draft_tokens"] = jnp.asarray(toks1, jnp.int32)
        for _ in range(3):
            _ = np.asarray(spec1_fn(params, **args1)["action_tokens"])
        t0 = time.time()
        n1 = max(n_calls, 20)
        for _ in range(n1):
            o1 = spec1_fn(params, **args1)
        _ = np.asarray(o1["action_tokens"])
        dt1 = (time.time() - t0) / n1
        extra = _bs1_extra(dt1, int(np.asarray(o1["n_accepted"])[0]))

    _emit({**_PENDING_ARTIFACT, **extra})


def _await_backend() -> bool:
    """Bounded wait for a live default backend (the axon TPU tunnel has had
    multi-hour outages where even a trivial jit hangs — see the verify
    skill's outage signature). Probes a trivial matmul in a SUBPROCESS under
    a per-probe timeout. Budget = min(BENCH_BACKEND_WAIT, global remaining
    minus a reserve for the measurement itself), so the wait can never eat
    the whole driver budget (the round-3 failure mode). Returns False when
    the backend never answered, so main can emit an honest error artifact
    instead of hanging the driver forever."""
    import subprocess

    # reserve ~2/3 of the global budget for the actual measurement (a cold
    # first-of-day compile through the tunnel can take 4-10 min)
    budget = min(float(os.environ.get("BENCH_BACKEND_WAIT", "600")),
                 _remaining() - 0.66 * float(os.environ.get("BENCH_DEADLINE", "1200")))
    if budget <= 0:
        return True  # no room to probe — let the run itself hit the backend
    probe = ("import jax, numpy as np; "
             "x = jax.numpy.ones((8, 8)); print(float(np.asarray(x @ x).sum()))")
    deadline = time.time() + budget
    while True:
        per_probe = max(60.0, deadline - time.time())
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               timeout=per_probe, capture_output=True)
            if r.returncode == 0:
                return True
            # fast nonzero exit = the backend ERRORED (the true outage
            # signature surfaces as an init exception) — retry within budget
        except subprocess.TimeoutExpired:
            # ambiguous: a healthy tunnel can take >5 min of fresh-process
            # init (round-5: repeated false "outage" verdicts while the chip
            # measured fine seconds later). PROCEED — the measurement itself
            # pays the init, and if the backend is truly dead the global
            # BENCH_DEADLINE + exit guards still emit the honest error
            # artifact. Never fail the whole bench on a probe timeout.
            print("# backend probe timed out; proceeding (deadline guards "
                  "the run)", file=sys.stderr)
            return True
        if time.time() + 120 >= deadline:
            return False
        print(f"# backend errored; retrying ({int(deadline - time.time())}s left)",
              file=sys.stderr)
        time.sleep(120)


def _try_flash_subprocess() -> bool:
    """Best-known config is mix + the flash prefill kernel (47.46 vs 46.72
    calls/s, PERF_r03.md ninth session) — but a Mosaic compile can HANG
    through the tunnel, so the default artifact must not bet on it
    in-process. Run the flash config in a bounded SUBPROCESS: print its
    artifact on success, fall back to the pure-XLA path on any failure.

    Engages only for the full-scale mix default with no explicit OVLA_PALLAS
    choice; BENCH_TRY_FLASH=0 disables. Its timeout is carved from the
    GLOBAL remaining budget with a reserve left for the pure-XLA fallback —
    it can no longer (round-3 failure) claim 35 min the driver doesn't have;
    when the remaining budget can't fit flash + fallback, flash is skipped."""
    import subprocess

    if (os.environ.get("BENCH_TRY_FLASH", "1") != "1"
            or os.environ.get("BENCH_SCALE", "full") != "full"
            or os.environ.get("BENCH_QUANT", "nibble") not in ("mix", "nibble")
            or "OVLA_PALLAS" in os.environ):
        return False
    flash_timeout = min(2100.0, _remaining() - 420.0)  # keep 7 min for fallback
    if flash_timeout < 300.0:
        print("# not enough budget for the flash attempt; running XLA path",
              file=sys.stderr)
        return False
    env = dict(os.environ,
               BENCH_TRY_FLASH="0", OVLA_PALLAS="1",
               # backend liveness was just confirmed by _await_backend, and
               # the child must spend its whole slice measuring
               BENCH_BACKEND_WAIT="0",
               BENCH_DEADLINE=str(int(flash_timeout - 15)),
               # flash prefill attention ONLY — every other kernel is a
               # measured e2e loser (PERF_r03.md kernel A/B table)
               OVLA_PALLAS_MATMUL="0", OVLA_PALLAS_DECODE="0",
               OVLA_PALLAS_VITLIN="0", OVLA_PALLAS_VITATTN="0",
               OVLA_PALLAS_VITMLP="0", OVLA_PALLAS_W4A8="0")
    global _FLASH_CHILD
    proc = subprocess.Popen([sys.executable, os.path.abspath(__file__)],
                            env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE)
    _FLASH_CHILD = proc  # the SIGTERM guard kills it: an orphaned child
    #                      would keep holding the one chip past our death
    try:
        stdout_b, _ = proc.communicate(timeout=flash_timeout)
        r = subprocess.CompletedProcess(proc.args, proc.returncode,
                                        stdout=stdout_b)
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.communicate()
        print("# flash subprocess timed out; falling back to XLA path",
              file=sys.stderr)
        return False
    finally:
        _FLASH_CHILD = None
    for line in reversed(r.stdout.decode().splitlines()):
        if line.startswith("{"):
            try:
                art = json.loads(line)
            except json.JSONDecodeError:
                break
            if r.returncode == 0 and art.get("value", 0) > 0:
                art["pallas_flash"] = True
                _emit(art)
                return True
            break
    print(f"# flash subprocess failed (rc={r.returncode}); falling back",
          file=sys.stderr)
    return False


def _install_exit_guards() -> None:
    """The artifact must be emitted on EVERY exit path. `timeout`/the driver
    kill with SIGTERM (which skips atexit), so both a signal handler and an
    atexit hook are installed; _emit's printed-flag makes them idempotent."""
    import atexit
    import signal

    def on_signal(signum, frame):
        if _FLASH_CHILD is not None:
            try:  # never orphan a chip-holding child past our own death
                _FLASH_CHILD.kill()
            except OSError:
                pass
        if _PENDING_ARTIFACT is not None:
            # the headline WAS measured — only a bonus stage was cut short.
            # Exit 0 with the real artifact: a signal exit code would make
            # rc-gating drivers record a failed run for a good measurement.
            _emit(_PENDING_ARTIFACT)
            sys.stdout.flush()
            os._exit(0)
        _emit_error(f"killed by signal {signum} before measurement finished")
        # restore default + re-raise so the exit code stays signal-accurate
        signal.signal(signum, signal.SIG_DFL)
        sys.stdout.flush()
        os.kill(os.getpid(), signum)

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, on_signal)
        except (ValueError, OSError):
            pass

    @atexit.register
    def on_exit():
        if not _ARTIFACT_PRINTED:
            if _PENDING_ARTIFACT is not None:
                _emit(_PENDING_ARTIFACT)
            else:
                _emit_error("bench exited before any measurement completed")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    _install_exit_guards()
    if not _await_backend():
        _emit_error("default backend unavailable (axon outage) — no measurement")
        sys.exit(1)
    try:
        if not _try_flash_subprocess():
            main()
    except BaseException as e:  # noqa: BLE001 — artifact-before-death contract
        if _PENDING_ARTIFACT is not None:
            # headline was measured; only a bonus stage died — report the
            # failure on stderr but keep the run (and its exit code) good
            _emit(_PENDING_ARTIFACT)
            import traceback

            traceback.print_exc()
            sys.exit(0)
        _emit_error(f"{type(e).__name__}: {e}")
        if not isinstance(e, KeyboardInterrupt):
            raise
        sys.exit(1)
