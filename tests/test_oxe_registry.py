"""OXE registry completeness: config keys <-> transform keys <-> mixtures.

Guards against key drift between the three registries (the round-1 `rh20t`
vs `rh20t_rlds` bug class): every dataset config must resolve through
OXE_STANDARDIZATION_TRANSFORMS, and every named mixture must materialize
kwargs for each of its EEF-encoded datasets without KeyError.

Reference: prismatic/vla/datasets/rlds/oxe/{configs.py,transforms.py,
mixtures.py,materialize.py}.
"""

from openvla_probe_tpu.vla.datasets.rlds.oxe.configs import (
    ActionEncoding,
    OXE_DATASET_CONFIGS,
)
from openvla_probe_tpu.vla.datasets.rlds.oxe.materialize import (
    get_oxe_dataset_kwargs_and_weights,
    make_oxe_dataset_kwargs,
)
from openvla_probe_tpu.vla.datasets.rlds.oxe.mixtures import OXE_NAMED_MIXTURES
from openvla_probe_tpu.vla.datasets.rlds.oxe.transforms import (
    OXE_STANDARDIZATION_TRANSFORMS,
)

EEF = (ActionEncoding.EEF_POS, ActionEncoding.EEF_R6)


def test_every_config_has_a_transform():
    missing = set(OXE_DATASET_CONFIGS) - set(OXE_STANDARDIZATION_TRANSFORMS)
    assert not missing, f"configs without a standardization transform: {sorted(missing)}"


def test_no_orphan_transforms():
    # a transform keyed off a name no config uses is unreachable (key drift).
    # The reference itself ships 3 config-less ppgm transforms
    # (transforms.py:849-851 vs configs.py) — those are the only allowed ones.
    orphans = set(OXE_STANDARDIZATION_TRANSFORMS) - set(OXE_DATASET_CONFIGS)
    assert orphans == {"ppgm", "ppgm_static", "ppgm_wrist"}, (
        f"unexpected transform/config key drift: {sorted(orphans)}"
    )


def test_every_mixture_dataset_is_registered():
    for mix_name, spec in OXE_NAMED_MIXTURES.items():
        for ds_name, weight in spec:
            assert ds_name in OXE_DATASET_CONFIGS, f"{mix_name}: unknown dataset {ds_name}"
            assert weight > 0.0, f"{mix_name}: non-positive weight for {ds_name}"


def test_every_mixture_materializes_kwargs():
    """Every EEF-encoded dataset in every mixture must produce full kwargs
    (incl. a callable standardize_fn); non-EEF datasets must fail the gate
    with ValueError, never KeyError."""
    for mix_name, spec in OXE_NAMED_MIXTURES.items():
        for ds_name, _ in spec:
            enc = OXE_DATASET_CONFIGS[ds_name]["action_encoding"]
            if enc in EEF:
                kwargs = make_oxe_dataset_kwargs(ds_name, "/data")
                assert callable(kwargs["standardize_fn"]), ds_name
                assert kwargs["name"] == ds_name
            else:
                try:
                    make_oxe_dataset_kwargs(ds_name, "/data")
                except ValueError:
                    pass  # expected: EEF gate
        # the mixture-level API must also resolve end-to-end
        per_kwargs, weights = get_oxe_dataset_kwargs_and_weights("/data", spec)
        n_eef = sum(
            1
            for ds_name, _ in dict(spec).items()  # dedup like the materializer
            if OXE_DATASET_CONFIGS[ds_name]["action_encoding"] in EEF
        )
        assert len(per_kwargs) == len(weights) == n_eef, mix_name


def test_rh20t_resolves():
    # regression: round-1 registered the transform as "rh20t_rlds"
    kwargs = make_oxe_dataset_kwargs("rh20t", "/data")
    assert kwargs["standardize_fn"] is OXE_STANDARDIZATION_TRANSFORMS["rh20t"]
