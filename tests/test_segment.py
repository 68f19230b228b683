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


def test_segment_softmax_extreme_masked_logit_gradients():
    """A masked logit far above the live max must not poison the live
    lanes' gradients (double-where: exp of the unclamped masked lane
    overflowed to inf and 0*inf=nan summed into every grad)."""
    import jax

    logits = jnp.array([0.0, 200.0])
    ids = jnp.array([0, 0])
    mask = jnp.array([True, False])
    out = segment_softmax(logits, ids, 1, mask)
    np.testing.assert_allclose(np.asarray(out), [1.0, 0.0])
    g = jax.grad(lambda l: segment_softmax(l, ids, 1, mask).sum())(logits)
    assert np.isfinite(np.asarray(g)).all()


def test_segment_max_initial_and_int_dtypes():
    """Empty segments honor `initial`; integer inputs keep their dtype
    (both were broken: initial was dead, ints promoted to float with
    INT_MIN empties)."""
    out = segment_max(jnp.array([3.0]), jnp.array([0]), 2,
                      mask=jnp.array([True]), initial=-1e9)
    np.testing.assert_allclose(np.asarray(out), [3.0, -1e9])
    out = segment_max(jnp.array([3, 4], jnp.int32), jnp.array([0, 0]), 3)
    assert out.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(out), [4, 0, 0])


def test_from_arrays_rejects_out_of_range_edges():
    """JAX gathers clamp silently — graph construction must reject edge
    ids outside [0, n)."""
    import pytest

    from ampnet_tpu.core.graph import from_arrays

    x = np.zeros((4, 3), np.float32)
    with pytest.raises(ValueError, match="outside"):
        from_arrays(x, np.array([[0, 9], [1, 2]]))
    with pytest.raises(ValueError, match="length"):
        from_arrays(x, np.array([[0, 1], [1, 2]]),
                    edge_norm=np.ones(5, np.float32))
