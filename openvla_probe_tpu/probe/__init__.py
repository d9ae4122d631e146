from .analysis import collect_logits, family_auprc, per_label_metrics
from .capture import CaptureSession, SymbolicDetector
from .episodes import EpisodeWriter, iter_episodes, list_episodes, load_episode
from .train_probes import ProbeBank, ProbeTrainConfig, save_metrics_csv

# keep the `probe.train_probes` attribute bound to the SUBMODULE (the bare
# function would shadow it); reach the function via probe.train_probes.train_probes
from . import train_probes  # noqa: E402

__all__ = [
    "CaptureSession",
    "EpisodeWriter",
    "ProbeBank",
    "ProbeTrainConfig",
    "SymbolicDetector",
    "collect_logits",
    "family_auprc",
    "iter_episodes",
    "list_episodes",
    "load_episode",
    "per_label_metrics",
    "save_metrics_csv",
    "train_probes",
]
