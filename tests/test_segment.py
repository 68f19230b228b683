"""Segment ops vs dense oracles, including the reference's star-graph
oracle (synthetic_benchmark/testing_message_passing_pyg.py:22-51)."""
import jax.numpy as jnp
import numpy as np
import pytest

from ampnet_tpu.ops.segment import (
    segment_count,
    segment_max,
    segment_mean,
    segment_softmax,
    segment_sum,
)


def test_segment_sum_matches_dense(rng):
    e, n, d = 57, 11, 5
    ids = rng.integers(0, n, e)
    data = rng.normal(size=(e, d)).astype(np.float32)
    out = segment_sum(jnp.asarray(data), jnp.asarray(ids), n)
    expect = np.zeros((n, d), np.float32)
    for i, s in enumerate(ids):
        expect[s] += data[i]
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)


def test_segment_sum_mask_excludes_padding(rng):
    e, n = 20, 4
    ids = rng.integers(0, n, e)
    data = rng.normal(size=(e, 3)).astype(np.float32)
    mask = np.zeros(e, bool)
    mask[:10] = True
    out = segment_sum(jnp.asarray(data), jnp.asarray(ids), n, jnp.asarray(mask))
    expect = np.zeros((n, 3), np.float32)
    for i in range(10):
        expect[ids[i]] += data[i]
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)


def test_star_graph_mean_oracle():
    """Reference oracle: 5-node star, edges into node 3 from 0,1,2,4 with
    identity messages; mean at node 3 = mean of neighbor features
    (testing_message_passing_pyg.py:37-40)."""
    x = jnp.asarray(np.array([[0, 0, 0], [4, 4, 4], [8, 8, 8], [12, 12, 12], [16, 16, 16]], np.float32))
    senders = jnp.asarray([0, 1, 2, 4])
    receivers = jnp.asarray([3, 3, 3, 3])
    out = segment_mean(x[senders], receivers, 5)
    np.testing.assert_allclose(out[3], [7.0, 7.0, 7.0], rtol=1e-6)
    # nodes with no incoming edges aggregate to zero
    np.testing.assert_allclose(out[0], [0.0, 0.0, 0.0])

    # with self loop: node 3 averages its own features too
    senders2 = jnp.asarray([0, 1, 2, 4, 3])
    receivers2 = jnp.asarray([3, 3, 3, 3, 3])
    out2 = segment_mean(x[senders2], receivers2, 5)
    np.testing.assert_allclose(out2[3], [8.0, 8.0, 8.0], rtol=1e-6)


def test_segment_mean_empty_segment_is_zero():
    data = jnp.ones((4, 2))
    ids = jnp.asarray([0, 0, 2, 2])
    out = segment_mean(data, ids, 4)
    np.testing.assert_allclose(out[1], [0.0, 0.0])
    np.testing.assert_allclose(out[3], [0.0, 0.0])


def test_segment_softmax_rows_sum_to_one(rng):
    e, n = 40, 6
    ids = np.sort(rng.integers(0, n, e))
    logits = rng.normal(size=(e,)).astype(np.float32)
    mask = rng.random(e) < 0.8
    w = segment_softmax(jnp.asarray(logits), jnp.asarray(ids), n, jnp.asarray(mask))
    sums = segment_sum(w, jnp.asarray(ids), n, jnp.asarray(mask))
    for s in range(n):
        seg_mask = (ids == s) & mask
        if seg_mask.any():
            np.testing.assert_allclose(sums[s], 1.0, rtol=1e-5)


def test_segment_max_and_count(rng):
    ids = jnp.asarray([0, 0, 1, 3])
    data = jnp.asarray([1.0, 5.0, -2.0, 7.0])
    np.testing.assert_allclose(segment_max(data, ids, 4), [5.0, -2.0, 0.0, 7.0])
    np.testing.assert_allclose(segment_count(ids, 4), [2, 1, 0, 1])
