"""Pallas decode kernel parity vs the plain-XLA reference implementation.

Runs in interpreter mode on CPU (tests force JAX_PLATFORMS=cpu); the same
kernel compiles on real TPU via bench_decode.py.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from centernet_lightning_tpu.ops import decode as D
from centernet_lightning_tpu.ops import pallas_decode as P


@pytest.mark.parametrize("layout", ["nhwc", "nchw"])
@pytest.mark.parametrize("shape", [(2, 16, 24, 5), (1, 32, 32, 32), (1, 8, 8, 33)])
def test_peak_class_scores_parity(rng, shape, layout):
    heatmap = rng.uniform(0, 1, size=shape).astype(np.float32)
    ref_scores, ref_labels = D.peak_class_scores(jnp.asarray(heatmap))
    got_scores, got_labels = P.peak_class_scores_pallas(
        jnp.asarray(heatmap), interpret=True, layout=layout
    )
    np.testing.assert_allclose(np.asarray(got_scores), np.asarray(ref_scores), atol=0)
    np.testing.assert_array_equal(np.asarray(got_labels), np.asarray(ref_labels))


def test_peak_nhwc_class_ties(rng):
    """The NHWC kernel's cross-lane argmax keeps torch.max first-index
    tie-breaking: duplicated class planes tie across the whole class
    axis and the lowest class index must win everywhere."""
    base = rng.uniform(0, 1, size=(1, 8, 8, 1)).astype(np.float32)
    heatmap = np.repeat(base, 7, axis=3)          # all classes tied
    ref_scores, ref_labels = D.peak_class_scores(jnp.asarray(heatmap))
    got_scores, got_labels = P.peak_class_scores_pallas(
        jnp.asarray(heatmap), interpret=True, layout="nhwc")
    np.testing.assert_allclose(np.asarray(got_scores), np.asarray(ref_scores), atol=0)
    np.testing.assert_array_equal(np.asarray(got_labels), np.asarray(ref_labels))


def test_peak_nhwc_bf16_input_gives_f32_scores(rng):
    """bf16 heatmaps (the model's own output dtype) feed the NHWC kernel
    directly; scores come back f32 and equal the f32 reference computed on
    the bf16 values (each bf16 converts exactly)."""
    hm16 = jnp.asarray(
        rng.normal(size=(2, 16, 16, 6)).astype(np.float32)).astype(jnp.bfloat16)
    ref_scores, ref_labels = D.peak_class_scores(
        hm16.astype(jnp.float32), from_logits=True)
    got_scores, got_labels = P.peak_class_scores_pallas(
        hm16, from_logits=True, interpret=True, layout="nhwc")
    assert got_scores.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got_scores), np.asarray(ref_scores), atol=0)
    np.testing.assert_array_equal(np.asarray(got_labels), np.asarray(ref_labels))


def test_full_decode_parity(rng):
    heatmap = rng.uniform(0, 1, size=(2, 16, 16, 6)).astype(np.float32)
    box = rng.normal(size=(2, 16, 16, 4)).astype(np.float32)
    ref = D.decode_detections(
        jnp.asarray(heatmap), jnp.asarray(box),
        num_detections=20, box_log=True, box_multiplier=16.0, stride=4,
    )
    got = P.decode_detections_pallas(
        jnp.asarray(heatmap), jnp.asarray(box),
        num_detections=20, box_log=True, box_multiplier=16.0, stride=4,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got["labels"]), np.asarray(ref["labels"]))
    np.testing.assert_allclose(np.asarray(got["scores"]), np.asarray(ref["scores"]))
    np.testing.assert_allclose(
        np.asarray(got["boxes"]), np.asarray(ref["boxes"]), rtol=1e-6
    )


def test_from_logits_parity(rng):
    """Logits-path decode == probs-path decode (sigmoid is monotonic)."""
    import jax

    logits = rng.normal(size=(2, 16, 16, 6)).astype(np.float32) * 3
    box = rng.normal(size=(2, 16, 16, 4)).astype(np.float32)
    probs = np.asarray(jax.nn.sigmoid(jnp.asarray(logits)))

    ref = D.decode_detections(jnp.asarray(probs), jnp.asarray(box),
                              num_detections=20, stride=4)
    got = D.decode_detections(jnp.asarray(logits), jnp.asarray(box),
                              num_detections=20, stride=4, from_logits=True)
    np.testing.assert_array_equal(np.asarray(got["labels"]), np.asarray(ref["labels"]))
    np.testing.assert_allclose(np.asarray(got["scores"]), np.asarray(ref["scores"]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got["boxes"]), np.asarray(ref["boxes"]),
                               rtol=1e-6)

    got_p = P.decode_detections_pallas(
        jnp.asarray(logits), jnp.asarray(box), num_detections=20, stride=4,
        from_logits=True, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got_p["labels"]), np.asarray(ref["labels"]))
    np.testing.assert_allclose(np.asarray(got_p["scores"]), np.asarray(ref["scores"]),
                               rtol=1e-6)


def test_peak_nhwc_multi_h_tile_halo(rng):
    """Force the NHWC kernel's H-tiling (ht < H) so peaks on tile-boundary
    rows exercise the one-row halo blocks: (64, 64, 96) needs ~9.4 MB of
    f32 intermediates, over the 8 MB budget -> ht=32, two tiles."""
    heatmap = rng.uniform(0, 1, size=(1, 64, 64, 96)).astype(np.float32)
    ref_scores, ref_labels = D.peak_class_scores(jnp.asarray(heatmap))
    got_scores, got_labels = P.peak_class_scores_pallas(
        jnp.asarray(heatmap), interpret=True, layout="nhwc")
    np.testing.assert_allclose(np.asarray(got_scores), np.asarray(ref_scores), atol=0)
    np.testing.assert_array_equal(np.asarray(got_labels), np.asarray(ref_labels))
