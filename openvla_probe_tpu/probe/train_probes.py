"""Per-layer linear probes on captured hidden states — all layers in one jit.

Re-implementation of the reference probe trainers
(experiment_utils/train_object_probes.py / train_spatial_probes.py /
train_dual_head_final.py / train_3class_direct.py) with identical statistical
semantics:

  * episode-level split: ids shuffled by random.Random(seed), first 10% = val
  * keep-filter: only label columns with BOTH a 0 and a 1 somewhere (:85-93)
  * pos_weight = (neg+1)/(pos+1) from the TRAIN split, clamped to 20 (:95-102)
  * masked BCE-with-logits; -1 (not-applicable) excluded everywhere
  * majority-class baseline trained-on-train, scored-on-val (:105-123)
  * optional column-shuffled-label control (:150-173)
  * AdamW lr 1e-3, wd 1e-4, 20 epochs, batch 4096, threshold 0.5
  * metrics: masked accuracy (device), macro-F1 / macro-AP (sklearn, host)

TPU-first difference: the reference trains 33 probes sequentially; here the
probe bank is ONE parameter tensor {w: [L, K, D], b: [L, K]} and every train
step updates all layers at once (per-layer mean-masked losses summed, so each
probe's optimization trajectory matches its standalone run). Head variants:
`binary` (default), `dual` (presence + truth heads), `3class` (direct CE).
"""

from __future__ import annotations

import dataclasses
import random
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .episodes import iter_episodes

DEFAULT_LABEL_KEYS = ("symbolic_state_object_relations", "symbolic_state_action_subgoals")


@dataclasses.dataclass(frozen=True)
class ProbeTrainConfig:
    epochs: int = 20
    batch_size: int = 4096
    learning_rate: float = 1e-3
    weight_decay: float = 1e-4
    pos_weight_clamp: float = 20.0
    threshold: float = 0.5
    seed: int = 0
    val_frac: float = 0.10
    head: str = "binary"            # binary | dual | 3class
    shuffled_label_control: bool = False
    freq_filter: Optional[Tuple[float, float]] = None  # dual-head (0.01, 0.99) filter


@dataclasses.dataclass
class ProbeBank:
    """Trained probe parameters for all layers + bookkeeping."""

    w: np.ndarray                  # [L, K_out, D]
    b: np.ndarray                  # [L, K_out]
    layers: List[int]
    keep: np.ndarray               # label-column indices kept
    head: str

    def save(self, path: Union[str, Path]) -> Path:
        path = Path(path)
        np.savez_compressed(
            path, w=self.w, b=self.b, layers=np.asarray(self.layers),
            keep=self.keep, head=np.asarray(self.head),
        )
        return path

    @staticmethod
    def load(path: Union[str, Path]) -> "ProbeBank":
        with np.load(path, allow_pickle=False) as z:
            return ProbeBank(
                w=z["w"], b=z["b"], layers=list(z["layers"]),
                keep=z["keep"], head=str(z["head"]),
            )

    def logits(self, x: np.ndarray, layer_pos: int) -> np.ndarray:
        """x: [N, D] hidden states of self.layers[layer_pos]."""
        return x @ self.w[layer_pos].T + self.b[layer_pos]


def _episode_xy(
    episodes: Sequence[Dict[str, np.ndarray]],
    label_keys: Sequence[str],
) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """Per-episode ([L+1, T, D] hidden, [T, K] labels)."""
    xs, ys = [], []
    for ep in episodes:
        xs.append(np.asarray(ep["visual_semantic_encoding"]))
        ys.append(np.concatenate([np.asarray(ep[k]) for k in label_keys], axis=1))
    return xs, ys


def _column_shuffle(y: np.ndarray, seed: int = 0) -> np.ndarray:
    g = np.random.default_rng(seed)
    out = y.copy()
    for c in range(out.shape[1]):
        out[:, c] = out[g.permutation(out.shape[0]), c]
    return out


def majority_baseline(y_tr: np.ndarray, y_val: np.ndarray) -> Dict[str, float]:
    """Column-majority predictor trained on train, scored on val (masked)."""
    from sklearn.metrics import f1_score

    m_tr = y_tr != -1
    maj = ((y_tr == 1) & m_tr).sum(0) > ((y_tr == 0) & m_tr).sum(0)
    m_val = y_val != -1
    tgt = (y_val == 1)
    pred = np.broadcast_to(maj, tgt.shape)
    acc = (pred == tgt)[m_val].mean() if m_val.any() else 0.0
    f1 = f1_score(tgt[m_val].astype(int), pred[m_val].astype(int),
                  average="macro", zero_division=0) if m_val.any() else 0.0
    return {"val_acc": float(acc), "val_f1": float(f1)}


def train_probes(
    data: Union[str, Path, Sequence[Dict[str, np.ndarray]]],
    cfg: ProbeTrainConfig = ProbeTrainConfig(),
    layers: Optional[Sequence[int]] = None,
    label_keys: Sequence[str] = DEFAULT_LABEL_KEYS,
    exclude_eps: Optional[Sequence[int]] = None,
) -> Dict[str, Any]:
    """Train the probe bank; returns {bank, records, baseline, split}.

    `records` rows match the reference CSV schema: layer / val_acc / val_f1 /
    val_ap (+ presence_f1/truth_f1 for dual, 3-class f1 for 3class).
    """
    if isinstance(data, (str, Path)):
        episodes = list(iter_episodes(data, exclude=exclude_eps))
    else:
        episodes = list(data)
    if not episodes:
        raise FileNotFoundError("No episodes to train on")

    xs, ys = _episode_xy(episodes, label_keys)
    n_layers_total = xs[0].shape[0]
    layers = list(layers) if layers is not None else list(range(n_layers_total))

    # episode-level split (reference: random.Random(0).shuffle, first 10% val)
    ep_ids = list(range(len(episodes)))
    random.Random(cfg.seed).shuffle(ep_ids)
    val_len = max(1, int(cfg.val_frac * len(ep_ids)))
    val_ids, train_ids = ep_ids[:val_len], ep_ids[val_len:]

    y_full = np.concatenate(ys, axis=0)
    if cfg.shuffled_label_control:
        y_shuf = _column_shuffle(y_full, cfg.seed)
        cursor = 0
        for i in range(len(ys)):
            n = ys[i].shape[0]
            ys[i] = y_shuf[cursor : cursor + n]
            cursor += n
        y_full = np.concatenate(ys, axis=0)

    # keep-filter over ALL episodes (train ∪ val)
    m_full = y_full != -1
    pos_any = ((y_full == 1) & m_full).any(0)
    neg_any = ((y_full == 0) & m_full).any(0)
    keep = np.nonzero(pos_any & neg_any)[0]
    if keep.size == 0:
        raise RuntimeError("No label flips value across remaining episodes.")

    y_tr = np.concatenate([ys[i] for i in train_ids], axis=0)[:, keep]
    y_val = np.concatenate([ys[i] for i in val_ids], axis=0)[:, keep]
    if cfg.freq_filter is not None:
        # dual-head: train-only positive-frequency filter (train_dual_head_final.py:99-113)
        m = y_tr != -1
        freq = ((y_tr == 1) & m).sum(0) / np.maximum(m.sum(0), 1)
        ok = (freq > cfg.freq_filter[0]) & (freq < cfg.freq_filter[1])
        keep = keep[ok]
        y_tr, y_val = y_tr[:, ok], y_val[:, ok]

    K = keep.size
    D = xs[0].shape[-1]
    L = len(layers)

    x_tr = np.concatenate([xs[i][layers] for i in train_ids], axis=1)   # [L, Ntr, D]
    x_val = np.concatenate([xs[i][layers] for i in val_ids], axis=1)    # [L, Nva, D]

    # pos_weight from train
    m_tr = y_tr != -1
    pos_cnt = ((y_tr == 1) & m_tr).sum(0).astype(np.float32)
    neg_cnt = ((y_tr == 0) & m_tr).sum(0).astype(np.float32)
    pos_w = np.minimum((neg_cnt + 1.0) / (pos_cnt + 1.0), cfg.pos_weight_clamp)

    baseline = majority_baseline(y_tr, y_val)

    K_out = {"binary": K, "dual": 2 * K, "3class": 3 * K}[cfg.head]
    key = jax.random.key(cfg.seed)
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(D)
    params = {
        "w": jax.random.uniform(kw, (L, K_out, D), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (L, K_out), jnp.float32, -bound, bound),
    }
    optimizer = optax.adamw(cfg.learning_rate, weight_decay=cfg.weight_decay)
    opt_state = optimizer.init(params)
    pos_w_j = jnp.asarray(pos_w)

    def head_loss(logits, y):                      # logits [L, B, K_out], y [B, K]
        mask = (y != -1)
        if cfg.head == "binary":
            tgt = (y == 1).astype(jnp.float32)
            bce = optax.sigmoid_binary_cross_entropy(logits, tgt[None])
            bce = bce * jnp.where(tgt[None] == 1, pos_w_j, 1.0)
            per_layer = (bce * mask[None]).sum((1, 2)) / jnp.maximum(mask.sum(), 1)
            return per_layer.sum()
        if cfg.head == "dual":
            pres, truth = logits[..., :K], logits[..., K:]
            pres_tgt = mask.astype(jnp.float32)
            pres_bce = optax.sigmoid_binary_cross_entropy(pres, pres_tgt[None])
            tr_tgt = (y == 1).astype(jnp.float32)
            tr_bce = optax.sigmoid_binary_cross_entropy(truth, tr_tgt[None]) * mask[None]
            return (pres_bce.mean((1, 2)) + tr_bce.sum((1, 2)) / jnp.maximum(mask.sum(), 1)).sum()
        # 3class: CE over {-1, 0, 1} -> class index y+1
        lg = logits.reshape(L, logits.shape[1], K, 3)
        tgt = (y + 1).astype(jnp.int32)
        logp = jax.nn.log_softmax(lg, axis=-1)
        nll = -jnp.take_along_axis(logp, tgt[None, :, :, None], axis=-1)[..., 0]
        return nll.mean((1, 2)).sum()

    @jax.jit
    def step(params, opt_state, x_all, y_all, idx):
        # data stays DEVICE-RESIDENT across the whole run; each step gathers
        # its batch on-device from the epoch permutation. (Slicing on host
        # shipped [L, B, D] — 2.2 GB at LIBERO scale — host->device EVERY
        # step: ~90 GB of PCIe/tunnel traffic per training run.)
        xb = jnp.take(x_all, idx, axis=1)
        yb = jnp.take(y_all, idx, axis=0)

        def loss_fn(p):
            logits = jnp.einsum("lbd,lkd->lbk", xb, p["w"]) + p["b"][:, None, :]
            return head_loss(logits, yb)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    x_tr_d = jnp.asarray(x_tr, jnp.float32)     # [L, Ntr, D] one transfer
    y_tr_d = jnp.asarray(y_tr)
    n_tr = x_tr.shape[1]
    g = np.random.default_rng(cfg.seed)
    for _ in range(cfg.epochs):
        order = g.permutation(n_tr)
        for s in range(0, n_tr, cfg.batch_size):
            idx = order[s : s + cfg.batch_size]
            _p, opt_state, _ = step(
                params, opt_state, x_tr_d, y_tr_d, jnp.asarray(idx),
            )
            params = _p

    bank = ProbeBank(
        w=np.asarray(params["w"]), b=np.asarray(params["b"]),
        layers=layers, keep=keep, head=cfg.head,
    )
    records = evaluate_probes(bank, x_val, y_val, cfg)
    return {
        "bank": bank,
        "records": records,
        "baseline": baseline,
        "split": {"train_ids": train_ids, "val_ids": val_ids},
    }


def evaluate_probes(
    bank: ProbeBank,
    x_val: np.ndarray,       # [L, N, D]
    y_val: np.ndarray,       # [N, K]
    cfg: ProbeTrainConfig = ProbeTrainConfig(),
) -> List[Dict[str, float]]:
    """Per-layer masked accuracy + macro-F1 + macro-AP (sklearn host metrics)."""
    from sklearn.metrics import average_precision_score, f1_score

    K = bank.keep.size
    mask = y_val != -1
    tgt = (y_val == 1).astype(int)
    records = []
    for li, layer in enumerate(bank.layers):
        logits = x_val[li].astype(np.float32) @ bank.w[li].T + bank.b[li]
        if bank.head == "binary":
            probs = 1.0 / (1.0 + np.exp(-logits))
            pred = (probs > cfg.threshold).astype(int)
            if mask.any():
                acc = (pred == tgt)[mask].mean()
                f1 = f1_score(tgt[mask], pred[mask], average="macro", zero_division=0)
                ap = average_precision_score(tgt[mask], probs[mask], average="macro")
            else:
                acc = f1 = ap = 0.0
            records.append({"layer": layer, "val_acc": float(acc),
                            "val_f1": float(f1), "val_ap": float(ap)})
        elif bank.head == "dual":
            pres = 1.0 / (1.0 + np.exp(-logits[:, :K]))
            truth = 1.0 / (1.0 + np.exp(-logits[:, K:]))
            pres_pred = (pres > cfg.threshold).astype(int)
            pres_f1 = f1_score(mask.astype(int).ravel(), pres_pred.ravel(),
                               average="macro", zero_division=0)
            pres_acc = float((pres_pred == mask.astype(int)).mean())
            tr_pred = (truth > cfg.threshold).astype(int)
            tr_f1 = (f1_score(tgt[mask], tr_pred[mask], average="macro", zero_division=0)
                     if mask.any() else 0.0)
            tr_acc = float((tr_pred == tgt)[mask].mean()) if mask.any() else 0.0
            records.append({"layer": layer,
                            "presence_acc": pres_acc, "truth_acc": tr_acc,
                            "presence_f1": float(pres_f1), "truth_f1": float(tr_f1)})
        else:  # 3class
            lg = logits.reshape(-1, K, 3)
            pred = lg.argmax(-1) - 1
            f1 = f1_score((y_val + 1).ravel(), (pred + 1).ravel(),
                          average="macro", zero_division=0)
            acc = float((pred == y_val).mean())
            records.append({"layer": layer, "val_acc": acc, "val_f1": float(f1)})
    return records


def save_metrics_csv(records: List[Dict[str, float]], path: Union[str, Path]) -> Path:
    """probe_metrics CSV in the reference's schema."""
    import csv

    path = Path(path)
    if records:
        with open(path, "w", newline="") as f:
            wr = csv.DictWriter(f, fieldnames=list(records[0].keys()))
            wr.writeheader()
            wr.writerows(records)
    return path
