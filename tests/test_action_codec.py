"""Golden-value and round-trip tests for the action codec.

The tokenize/detokenize contract is checked against an independent numpy
re-derivation of the reference semantics (SURVEY.md §2: ActionTokenizer +
modeling_prismatic detokenize path), including the off-by-one clip.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from openvla_probe_tpu.vla.action_tokenizer import ActionCodec, ActionTokenizer
from openvla_probe_tpu.vla import norm_stats as ns

VOCAB = 32000


class FakeTokenizer:
    vocab_size = VOCAB

    def decode(self, ids):
        return " ".join(str(i) for i in ids)


def reference_tokenize(action: np.ndarray) -> np.ndarray:
    bins = np.linspace(-1, 1, 256)
    a = np.clip(action, -1.0, 1.0)
    return VOCAB - np.digitize(a, bins)


def reference_detokenize(ids: np.ndarray) -> np.ndarray:
    bins = np.linspace(-1, 1, 256)
    centers = (bins[:-1] + bins[1:]) / 2.0
    idx = VOCAB - ids
    return centers[np.clip(idx - 1, 0, 254)]


@pytest.fixture
def codec():
    return ActionCodec(vocab_size=VOCAB)


def test_encode_matches_np_digitize(codec, rng):
    a = rng.uniform(-1.5, 1.5, size=(64, 7))
    got = np.asarray(codec.encode(jnp.asarray(a)))
    want = reference_tokenize(a)
    np.testing.assert_array_equal(got, want)


def test_encode_edge_values(codec):
    a = np.array([-1.0, -0.999999, 0.0, 0.999999, 1.0])
    got = np.asarray(codec.encode(jnp.asarray(a)))
    want = reference_tokenize(a)
    np.testing.assert_array_equal(got, want)
    # -1.0 digitizes to index 1 -> highest token; 1.0 to 256 -> lowest token
    assert got[0] == VOCAB - 1
    assert got[-1] == VOCAB - 256


def test_decode_matches_reference(codec, rng):
    ids = rng.integers(VOCAB - 256, VOCAB, size=(32, 7))
    got = np.asarray(codec.decode(jnp.asarray(ids)))
    want = reference_detokenize(ids)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_round_trip_error_bounded(codec, rng):
    a = rng.uniform(-1, 1, size=(128, 7)).astype(np.float32)
    back = np.asarray(codec.decode(codec.encode(jnp.asarray(a))))
    # quantization error <= bin width (= 2/255); interior points <= half width
    assert np.max(np.abs(back - a)) <= 2.0 / 255.0 + 1e-6


def test_action_token_begin_idx(codec):
    assert codec.action_token_begin_idx == VOCAB - 257


def test_host_tokenizer_matches_codec(rng):
    at = ActionTokenizer(FakeTokenizer())
    a = rng.uniform(-1.2, 1.2, size=(7,))
    np.testing.assert_array_equal(at.encode_to_ids(a), reference_tokenize(a))
    ids = at.encode_to_ids(a)
    np.testing.assert_allclose(
        at.decode_token_ids_to_actions(ids), reference_detokenize(ids), atol=1e-7
    )


def test_unnormalize_with_mask(codec):
    a = np.array([-1.0, 0.0, 1.0, 0.5], dtype=np.float32)
    q01 = np.array([0.0, -2.0, 10.0, 0.0], dtype=np.float32)
    q99 = np.array([1.0, 2.0, 20.0, 1.0], dtype=np.float32)
    mask = np.array([True, True, True, False])
    out = np.asarray(codec.unnormalize(jnp.asarray(a), q01, q99, mask))
    np.testing.assert_allclose(out[:3], [0.0, 0.0, 20.0], atol=1e-6)
    assert out[3] == pytest.approx(0.5)  # masked-out dim passes through


def test_norm_stats_roundtrip(rng):
    rows = rng.normal(size=(1000, 7)).astype(np.float32)
    stats = ns.compute_array_statistics(rows)
    x = rng.uniform(-0.5, 0.5, size=(16, 7)).astype(np.float32)
    for t in [ns.NormalizationType.BOUNDS_Q99, ns.NormalizationType.BOUNDS, ns.NormalizationType.NORMAL]:
        y = ns.normalize(x, stats, t)
        back = ns.unnormalize(y, stats, t)
        if t == ns.NormalizationType.NORMAL:
            np.testing.assert_allclose(back, x, atol=1e-4)
        else:
            # bounds types clip; interior values round-trip
            interior = (x > stats["q01"]) & (x < stats["q99"])
            np.testing.assert_allclose(back[interior], x[interior], atol=1e-3)


def test_normalize_zeroes_degenerate_dims():
    stats = {
        "mean": np.zeros(2, np.float32), "std": np.ones(2, np.float32),
        "min": np.array([0.0, 1.0], np.float32), "max": np.array([1.0, 1.0], np.float32),
        "q01": np.array([0.0, 1.0], np.float32), "q99": np.array([1.0, 1.0], np.float32),
    }
    y = ns.normalize(np.array([0.5, 5.0], np.float32), stats, ns.NormalizationType.BOUNDS)
    assert y[1] == 0.0  # min == max -> zeroed


def test_stats_json_roundtrip(tmp_path, rng):
    rows = rng.normal(size=(100, 7))
    stats = {"some_dataset": ns.compute_dataset_statistics([{"action": rows}])}
    p = ns.save_dataset_statistics(stats, tmp_path)
    loaded = ns.load_dataset_statistics(p)
    np.testing.assert_allclose(
        loaded["some_dataset"]["action"]["q99"], stats["some_dataset"]["action"]["q99"], rtol=1e-6
    )
    assert loaded["some_dataset"]["num_transitions"] == 100


def test_device_codec_matches_host_under_jit(codec, rng):
    import jax

    a = rng.uniform(-1, 1, size=(8, 7)).astype(np.float32)
    jit_enc = jax.jit(codec.encode)
    np.testing.assert_array_equal(np.asarray(jit_enc(a)), reference_tokenize(a))
