"""Public model loaders: available_models / load / load_vla.

Same surface + discovery semantics as the reference loaders
(prismatic/models/load.py:52-226):

  * local HF-layout safetensors dirs (released OpenVLA models, this repo's
    `convert_weights_to_hf.py` exports),
  * local reference-NATIVE run dirs (`config.json` +
    `checkpoints/latest-checkpoint.pt` [+ `dataset_statistics.json`]) and
    direct `.pt` checkpoint paths (the reference `load_vla` calling
    convention),
  * HF-Hub ids: registry ids resolve against TRI-ML/prismatic-vlms
    (`{model_id}/config.json` + `{model_id}/checkpoints/latest-checkpoint.pt`),
    VLA ids against openvla/openvla-dev
    (`{model_type}/{id}/{config.json,dataset_statistics.json,checkpoints/step-*.pt}`
    with `step_to_load` selection), and `org/name` ids as full HF repos
    (HF-layout snapshot, e.g. openvla/openvla-7b).

Hub access honors `OVLA_HUB_OFFLINE=1` (resolve strictly from the local hub
cache — what a zero-egress environment uses) and `cache_dir`/`hf_token`
arguments; tests exercise the hub paths against a local cache fixture.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..overwatch import initialize_overwatch
from ..vla.norm_stats import load_dataset_statistics
from . import catalog, vla, vlm
from .tokenization import load_tokenizer

overwatch = initialize_overwatch(__name__)

HF_HUB_REPO = "TRI-ML/prismatic-vlms"       # base-VLM run dirs
VLA_HF_HUB_REPO = "openvla/openvla-dev"     # VLA run dirs


def _hub_offline() -> bool:
    return os.environ.get("OVLA_HUB_OFFLINE", "0") == "1"


def _hub_download(repo_id: str, filename: str, cache_dir=None, hf_token=None) -> Path:
    from huggingface_hub import hf_hub_download

    return Path(hf_hub_download(repo_id=repo_id, filename=filename,
                                cache_dir=cache_dir, token=hf_token,
                                local_files_only=_hub_offline()))


def _hub_snapshot(repo_id: str, cache_dir=None, hf_token=None) -> Path:
    from huggingface_hub import snapshot_download

    return Path(snapshot_download(repo_id=repo_id, cache_dir=cache_dir,
                                  token=hf_token,
                                  local_files_only=_hub_offline()))


def _is_native_run_dir(path: Path) -> bool:
    ckpts = path / "checkpoints"
    return ckpts.is_dir() and any(ckpts.glob("*.pt"))


def _latest_native_ckpt(path: Path) -> Path:
    latest = path / "checkpoints" / "latest-checkpoint.pt"
    if latest.exists():
        return latest
    cands = sorted((path / "checkpoints").glob("*.pt"))
    if not cands:
        raise FileNotFoundError(f"No .pt checkpoint under {path / 'checkpoints'}")
    return cands[-1]


def available_models() -> List[str]:
    return list(catalog.MODEL_REGISTRY.keys())


def available_model_names() -> List[str]:
    return [m["names"][0] for m in catalog.MODEL_REGISTRY.values()]


def get_model_description(model_id_or_name: str) -> str:
    meta = catalog.GLOBAL_REGISTRY.get(model_id_or_name)
    if meta is None:
        raise ValueError(f"Unknown model `{model_id_or_name}`; have {available_models()}")
    desc = meta["description"]
    if isinstance(desc, dict):
        return json.dumps(desc, indent=2)
    return str(desc)


def load(
    model_path: Union[str, Path],
    dtype=jnp.bfloat16,
    cache_dir: Optional[Union[str, Path]] = None,
    hf_token: Optional[str] = None,
) -> Dict[str, Any]:
    """Load a base Prismatic VLM from local disk or the HF Hub.

    Mirrors the reference `load()` (prismatic/models/load.py:52-118): a local
    dir loads directly (HF-layout or native run dir); a registry id downloads
    `{model_id}/config.json` + `{model_id}/checkpoints/latest-checkpoint.pt`
    from TRI-ML/prismatic-vlms; an `org/name` id snapshots that HF repo.

    Returns {params, cfg, image_cfg, prompt_builder, tokenizer}.
    """
    path = Path(model_path)
    if path.is_dir():
        if _is_native_run_dir(path):
            overwatch.info(f"Loading native run dir `{path}`")
            bundle = catalog.load_prismatic_checkpoint(
                path / "config.json", _latest_native_ckpt(path),
                path / "dataset_statistics.json", dtype=dtype)
        else:
            bundle = catalog.load_openvla_hf_checkpoint(path, dtype=dtype)
        bundle["tokenizer"] = _tokenizer_for(path, bundle)
        return bundle

    model_id = str(model_path)
    if model_id in catalog.GLOBAL_REGISTRY or model_id in catalog.MODEL_REGISTRY:
        meta = catalog.GLOBAL_REGISTRY.get(model_id) or catalog.MODEL_REGISTRY[model_id]
        if meta.get("hf_repo"):
            # released policies (openvla-7b etc.) ship as standalone
            # HF-layout repos, not TRI-ML run dirs — a per-file fetch
            # against prismatic-vlms would 404
            snap = _hub_snapshot(meta["hf_repo"], cache_dir, hf_token)
            bundle = catalog.load_openvla_hf_checkpoint(snap, dtype=dtype)
            bundle["tokenizer"] = _tokenizer_for(snap, bundle)
            return bundle
        hub_id = meta.get("model_id", model_id)
        overwatch.info(f"Downloading `{hub_id}` from {HF_HUB_REPO}")
        config_json = _hub_download(HF_HUB_REPO, f"{hub_id}/config.json",
                                    cache_dir, hf_token)
        checkpoint_pt = _hub_download(
            HF_HUB_REPO, f"{hub_id}/checkpoints/latest-checkpoint.pt",
            cache_dir, hf_token)
        bundle = catalog.load_prismatic_checkpoint(config_json, checkpoint_pt,
                                                   dtype=dtype)
        bundle["tokenizer"] = _tokenizer_for(config_json.parent, bundle)
        return bundle
    if "/" in model_id:
        snap = _hub_snapshot(model_id, cache_dir, hf_token)
        bundle = catalog.load_openvla_hf_checkpoint(snap, dtype=dtype)
        bundle["tokenizer"] = _tokenizer_for(snap, bundle)
        return bundle
    raise ValueError(
        f"`{model_id}` is neither a local checkpoint dir, a registry id "
        f"(see available_models()), nor an org/name HF repo id")


def _tokenizer_for(path: Path, bundle: Dict[str, Any]):
    """Checkpoint-local tokenizer files when present; otherwise the
    prompt-family default (native run dirs carry no tokenizer — the reference
    pulls it from the base LLM's hub repo, which a zero-egress deployment
    resolves from the local HF cache)."""
    try:
        return load_tokenizer(path)
    except Exception as e:
        overwatch.warning(
            f"No tokenizer files under {path} ({e}); pass/attach one "
            "explicitly before serving — predict_action needs .encode")
        return None


def load_vla(
    checkpoint_path: Union[str, Path],
    dtype=jnp.bfloat16,
    prompt_pad_len: int = 48,
    quantize_int8: bool = False,
    quantize_bits: Union[int, str] = 8,
    cache_dir: Optional[Union[str, Path]] = None,
    hf_token: Optional[str] = None,
    step_to_load: Optional[int] = None,
    model_type: str = "pretrained",
) -> vla.OpenVLA:
    """Load an OpenVLA policy ready to serve, from disk or the HF Hub.

    Mirrors the reference `load_vla()` discovery (prismatic/models/load.py:
    122-226): a direct `.pt` path under `<run>/checkpoints/`, an HF-layout or
    native run dir, an openvla/openvla-dev run id (`{model_type}/{id}` with
    `step_to_load` checkpoint selection), or an `org/name` HF repo
    (e.g. openvla/openvla-7b). `quantize_int8` switches the Llama trunk to
    the weight-only turbo mode — int8, grouped int4 with `quantize_bits=4`
    (half the int8 weight stream), or dual-precision with
    `quantize_bits="mix"` (int8 prefill + int4 decode, 1.5x the int8 bytes
    resident — PERF_r03.md), or nibble-plane with `quantize_bits="nibble"`
    (ONE int8-grade trunk as two 4-bit planes: exact-int8 prefill, hi-plane
    int4-traffic decode, int8-footprint residency — VERDICT r4 #1); bf16
    stays the bit-parity mode.
    """
    import contextlib

    path = Path(checkpoint_path)
    # quantized serving: build (and quantize) the checkpoint tree on the
    # HOST CPU backend first, then ship only the quantized bytes to the
    # accelerator. Quantizing on-device needs the full bf16 trunk + f32
    # absmax transients + both quantized copies concurrently — measured
    # 20.6 GB at 7B-mix against a 15.75 GB chip (dress rehearsal,
    # PERF_r04.md). CPU-side it is a few minutes in host RAM, and the
    # host->device transfer shrinks to the quantized footprint.
    build_ctx = (jax.default_device(jax.local_devices(backend="cpu")[0])
                 if quantize_int8 else contextlib.nullcontext())
    with build_ctx:
        if path.is_file():
            # reference calling convention: .../<RUN_ID>/checkpoints/<CKPT>.pt
            if path.suffix != ".pt" or path.parent.name != "checkpoints":
                raise ValueError(f"Expected .../<run>/checkpoints/<ckpt>.pt, got {path}")
            run_dir = path.parents[1]
            bundle = catalog.load_prismatic_checkpoint(
                run_dir / "config.json", path,
                run_dir / "dataset_statistics.json", dtype=dtype)
            bundle["tokenizer"] = _tokenizer_for(run_dir, bundle)
            path = run_dir
        elif (not path.is_dir()
              and (str(checkpoint_path) in catalog.GLOBAL_REGISTRY
                   or str(checkpoint_path) in catalog.MODEL_REGISTRY)):
            # registry ids route through load() (which honors hf_repo for
            # released standalone policies like openvla-7b)
            bundle = load(checkpoint_path, dtype=dtype, cache_dir=cache_dir,
                          hf_token=hf_token)
        elif not path.is_dir() and "/" not in str(checkpoint_path):
            # openvla-dev run id: {model_type}/{id}/... with step discovery
            bundle, path = _load_vla_from_hub(str(checkpoint_path), model_type,
                                              step_to_load, cache_dir, hf_token,
                                              dtype)
        else:
            bundle = load(path, dtype=dtype, cache_dir=cache_dir, hf_token=hf_token)
    norm_stats = bundle.get("norm_stats") or {}
    sidecar = Path(path) / "dataset_statistics.json"
    if sidecar.exists():
        norm_stats = load_dataset_statistics(sidecar)
    if not norm_stats:
        overwatch.warning("Checkpoint carries no norm_stats; predict_action will need explicit stats")
    params = bundle["params"]
    if quantize_bits != 8 and not quantize_int8:
        # conflicting knobs RAISE (the with_env_overrides convention):
        # silently serving bf16 parity after the caller asked for an int4/mix
        # trunk would mislabel every downstream measurement
        raise ValueError(
            f"quantize_bits={quantize_bits!r} requires quantize_int8=True "
            "(the quantize switch); without it the model serves bf16 parity")
    if quantize_int8:
        from ..ops.linear import materialize_int4, quantize_params

        cpu = jax.local_devices(backend="cpu")[0]
        dev = jax.devices()[0]
        with jax.default_device(cpu):
            # quantize on host (the whole tree is CPU-resident from
            # build_ctx); int4 leaves stay int8 CODES here — they get their
            # canonical s4 layout at birth ON the accelerator below
            shapes = jax.eval_shape(
                lambda p: quantize_params(p, bits=quantize_bits), params["llm"])
            raw = jax.jit(
                lambda p: quantize_params(p, bits=quantize_bits, emit_codes=True),
                donate_argnums=0)(params["llm"])
        bundle["params"] = None

        def ship(sh, lf):
            # per-leaf host->device; codes leaves materialize to s4 on the
            # device and the int8 codes transient frees immediately, so the
            # device peak is the final tree + ONE codes leaf
            on_dev = jax.device_put(lf, dev)
            if sh.dtype == jnp.int4:
                s4 = materialize_int4(on_dev)
                # VALUE FETCH before deleting the codes source: on the
                # tunneled axon backend only a host transfer reliably waits
                # for real execution (CLAUDE.md; same pattern as
                # multilora.fuse_bank_into_base) — deleting the int8 codes
                # before materialize_int4 actually ran would corrupt the
                # freshly materialized s4 copy.
                np.asarray(jax.device_get(s4.ravel()[0]))
                on_dev.delete()
                return s4
            return on_dev

        llm_q = jax.tree.map(ship, shapes, raw)
        params = {**params, "llm": llm_q}
        # the non-trunk leaves (vision/projector/embed, still CPU-resident
        # under build_ctx) ship as-is
        params = jax.tree.map(
            lambda lf: (jax.device_put(lf, dev)
                        if isinstance(lf, jax.Array) and lf.device != dev
                        else lf), params)
    serving = vla.VLAServingConfig(
        vlm=bundle["cfg"], prompt_pad_len=prompt_pad_len,
        codec_vocab_size=_codec_vocab_size(path, bundle["cfg"]),
        # int8 weights already forgo bit-parity, so the config says so — this
        # is what unlocks turbo-tier features (speculative drafts) on the
        # serving-tier matrix (VLAServingConfig docstring)
        tier="turbo" if quantize_int8 else "parity",
    )
    return vla.OpenVLA(
        params, serving, bundle["tokenizer"], norm_stats, bundle["image_cfg"]
    )


def _load_vla_from_hub(
    run_id: str,
    model_type: str,
    step_to_load: Optional[int],
    cache_dir,
    hf_token,
    dtype,
):
    """openvla/openvla-dev discovery: `{model_type}/{run_id}/{config.json,
    dataset_statistics.json, checkpoints/step-*.pt}` with step selection
    (reference prismatic/models/load.py:146-170)."""
    relpath = f"{model_type}/{run_id}"
    config_json = _hub_download(VLA_HF_HUB_REPO, f"{relpath}/config.json",
                                cache_dir, hf_token)
    stats_json = _hub_download(VLA_HF_HUB_REPO,
                               f"{relpath}/dataset_statistics.json",
                               cache_dir, hf_token)
    step_tag = f"{step_to_load:06d}" if step_to_load is not None else ""
    if _hub_offline():
        # the snapshot is on local disk: discover checkpoints next to config
        cands = sorted((config_json.parent / "checkpoints").glob(f"step-{step_tag}*.pt"))
        cands = [c.name for c in cands]
    else:
        from huggingface_hub import HfFileSystem

        fs = HfFileSystem(token=hf_token)
        hf_path = f"{VLA_HF_HUB_REPO}/{relpath}"
        if not fs.exists(hf_path):
            raise ValueError(f"No HF Hub path `{hf_path}`")
        cands = [Path(p).name
                 for p in fs.glob(f"{hf_path}/checkpoints/step-{step_tag}*.pt")]
    if not cands or (step_to_load is not None and len(cands) != 1):
        raise ValueError(
            f"Couldn't find a unique checkpoint for step={step_to_load} under "
            f"{relpath}/checkpoints (found {cands})")
    checkpoint_pt = _hub_download(
        VLA_HF_HUB_REPO, f"{relpath}/checkpoints/{sorted(cands)[-1]}",
        cache_dir, hf_token)
    bundle = catalog.load_prismatic_checkpoint(config_json, checkpoint_pt,
                                               stats_json, dtype=dtype)
    bundle["tokenizer"] = _tokenizer_for(config_json.parent, bundle)
    return bundle, config_json.parent


def _codec_vocab_size(path: Path, cfg: vlm.VLMConfig) -> int:
    """Effective action vocab: text vocab minus the pad_to_multiple_of round-up
    (extern/hf/modeling_prismatic.py:500-504)."""
    try:
        with open(path / "config.json") as f:
            hf_cfg = json.load(f)
        return int(hf_cfg["text_config"]["vocab_size"]) - int(hf_cfg.get("pad_to_multiple_of", 64))
    except Exception:
        return cfg.llm.vocab_size - 64 if cfg.llm.vocab_size % 64 == 0 and cfg.llm.vocab_size > 32000 else cfg.llm.vocab_size
