"""Modality- and length-grouped batch sampling for VLM pretraining.

Re-implementation of the reference's SplitModalitySampler
(prismatic/util/batching_utils.py:23-212, the LLaVa trick): global batches are
all-multimodal or all-unimodal, and within each global batch examples are
length-bucketed per device so every device gets similarly-long sequences (less
padding waste -> fewer wasted FLOPs); the longest batch goes FIRST so OOMs
surface immediately. Deterministic per (seed, epoch).
"""

from __future__ import annotations

from typing import Iterator, List, Sequence, Tuple

import numpy as np


class SplitModalitySampler:
    def __init__(
        self,
        modality_lengths: Sequence[Tuple[bool, int]],
        global_batch_size: int,
        num_replicas: int = 1,
        rank: int = 0,
        seed: int = 0,
        drop_last: bool = True,
    ) -> None:
        self.modality_lengths = list(modality_lengths)
        self.global_batch_size = global_batch_size
        self.num_replicas, self.rank, self.seed = num_replicas, rank, seed
        self.epoch = 0
        assert global_batch_size % num_replicas == 0
        self.per_replica = global_batch_size // num_replicas
        n_batches = len(self.modality_lengths) // global_batch_size
        self.total_size = n_batches * global_batch_size
        self.num_samples = self.total_size // num_replicas

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _grouped_batches(self, g: np.random.Generator) -> List[List[int]]:
        mm = [i for i, (is_mm, _) in enumerate(self.modality_lengths) if is_mm]
        uni = [i for i, (is_mm, _) in enumerate(self.modality_lengths) if not is_mm]
        batches: List[List[int]] = []
        for idxs in (mm, uni):
            idxs = list(np.asarray(idxs)[g.permutation(len(idxs))])
            for s in range(0, len(idxs) - self.global_batch_size + 1, self.global_batch_size):
                batch = idxs[s : s + self.global_batch_size]
                # sort by length, then deal into per-replica contiguous runs so
                # each replica sees similar lengths
                batch = sorted(batch, key=lambda i: self.modality_lengths[i][1], reverse=True)
                batches.append([int(i) for i in batch])
        # longest global batch first (OOM-surfacing trick, reference :172-180)
        batches.sort(
            key=lambda b: max(self.modality_lengths[i][1] for i in b), reverse=True
        )
        first, rest = batches[:1], batches[1:]
        rest_idx = g.permutation(len(rest))
        return first + [rest[i] for i in rest_idx]

    def __iter__(self) -> Iterator[int]:
        g = np.random.default_rng(self.seed + self.epoch)
        for batch in self._grouped_batches(g):
            # replica r takes the r-th length-contiguous slice
            start = self.rank * self.per_replica
            for i in batch[start : start + self.per_replica]:
                yield i

    def __len__(self) -> int:
        return self.num_samples
