"""Tokenizer math: sampling distributions, scaling, token assembly."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ampnet_tpu.ops.tokenize import (
    balanced_sample_features,
    gather_tokens,
    pca_feature_embedding,
    sample_present_features,
    standardize,
)


def test_standardize_matches_sklearn(rng):
    sklearn = pytest.importorskip("sklearn.preprocessing")
    x = rng.normal(size=(50, 7)).astype(np.float32)
    x[:, 3] = 2.0  # zero-variance column
    ours = np.asarray(standardize(jnp.asarray(x)))
    theirs = sklearn.StandardScaler().fit_transform(x)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_standardize_respects_node_mask(rng):
    x = rng.normal(size=(10, 3)).astype(np.float32)
    mask = np.array([True] * 6 + [False] * 4)
    x_pad = x.copy()
    x_pad[6:] = 999.0  # garbage in padding
    out = np.asarray(standardize(jnp.asarray(x_pad), node_mask=jnp.asarray(mask)))
    expect = np.asarray(standardize(jnp.asarray(x[:6])))
    np.testing.assert_allclose(out[:6], expect, rtol=1e-4, atol=1e-4)


def test_sample_present_features_only_picks_nonzero(rng):
    x = np.zeros((5, 20), np.float32)
    present = {0: [1, 5], 1: [0], 2: [19], 3: [2, 3, 4], 4: [7, 8]}
    for n, idxs in present.items():
        x[n, idxs] = 1.0
    idx = np.asarray(sample_present_features(jax.random.PRNGKey(0), jnp.asarray(x), 16))
    assert idx.shape == (5, 16)
    for n, allowed in present.items():
        assert set(idx[n].tolist()) <= set(allowed)


def test_sample_present_is_with_replacement_and_uniform():
    x = np.zeros((1, 10), np.float32)
    x[0, [2, 7]] = 1.0
    idx = np.asarray(sample_present_features(jax.random.PRNGKey(1), jnp.asarray(x), 2000))[0]
    counts = np.bincount(idx, minlength=10)
    assert counts[2] + counts[7] == 2000
    assert abs(counts[2] - 1000) < 150  # roughly uniform


def test_balanced_sample_without_replacement():
    x = np.zeros((3, 30), np.float32)
    x[:, :10] = 1.0
    idx = np.asarray(balanced_sample_features(jax.random.PRNGKey(0), jnp.asarray(x), 12))
    for row in idx:
        assert len(set(row.tolist())) == 12  # no repeats
    # ~half the draws from present features (10 of 30), chance alone would give 4
    frac_present = (idx < 10).mean()
    assert 0.3 < frac_present < 0.7


def test_gather_tokens_layout(rng):
    n, f, s, d = 4, 6, 3, 5
    x = rng.normal(size=(n, f)).astype(np.float32)
    table = rng.normal(size=(f, d - 1)).astype(np.float32)
    idx = rng.integers(0, f, size=(n, s)).astype(np.int32)
    toks = np.asarray(gather_tokens(jnp.asarray(x), jnp.asarray(idx), jnp.asarray(table)))
    assert toks.shape == (n, s, d)
    for i in range(n):
        for j in range(s):
            np.testing.assert_allclose(toks[i, j, :-1], table[idx[i, j]])
            np.testing.assert_allclose(toks[i, j, -1], x[i, idx[i, j]])


def test_pca_embedding_matches_sklearn(rng):
    decomposition = pytest.importorskip("sklearn.decomposition")
    x = rng.normal(size=(40, 12)).astype(np.float32)
    k = 5
    ours = pca_feature_embedding(x, k)
    theirs = decomposition.PCA(n_components=k).fit_transform(x.T)
    assert ours.shape == (12, k)
    # PCA components have sign ambiguity — compare per-column up to sign
    for c in range(k):
        d_same = np.abs(ours[:, c] - theirs[:, c]).max()
        d_flip = np.abs(ours[:, c] + theirs[:, c]).max()
        assert min(d_same, d_flip) < 1e-3


def test_tfidf_sampling_prefers_rare_features():
    from ampnet_tpu.ops.tokenize import tfidf_sample_features

    # feature 0 present in ALL nodes (low idf); feature 5 present in one
    x = np.zeros((20, 10), np.float32)
    x[:, 0] = 1.0
    x[3, 5] = 1.0
    idx = np.asarray(tfidf_sample_features(jax.random.PRNGKey(0), jnp.asarray(x), 400))
    # node 3: the rare feature should dominate its draws
    counts = np.bincount(idx[3], minlength=10)
    assert counts[5] > counts[0]
    # nodes without the rare feature only draw present features
    assert set(idx[0].tolist()) == {0}


def test_tile_all_tokens_feature_repeats(rng):
    """The non-downsampled tiled-table variant (amp_gcn.py:168-180) with
    feature_repeats > 1: token j carries feature j % F's value (a slice
    bug previously broke every repeats>1 config at trace time)."""
    import jax.numpy as jnp

    from ampnet_tpu.ops.tokenize import tile_all_tokens

    n, f, d, reps = 4, 3, 5, 2
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    table = jnp.asarray(rng.normal(size=(f, d)).astype(np.float32))
    toks = tile_all_tokens(x, table, reps)
    assert toks.shape == (n, f * reps, d + 1)
    for j in range(f * reps):
        np.testing.assert_array_equal(np.asarray(toks[:, j, :d]),
                                      np.asarray(table[j % f]) * np.ones((n, 1)))
        np.testing.assert_array_equal(np.asarray(toks[:, j, d]),
                                      np.asarray(x[:, j % f]))


def test_tfidf_idf_ignores_padding(rng):
    """Padded all-zero rows must not shift the idf: with node_mask the
    sampling distribution is identical before and after padding."""
    import jax
    import jax.numpy as jnp

    from ampnet_tpu.ops.tokenize import tfidf_sample_features

    n, f, s = 12, 10, 6
    x = (rng.random((n, f)) < 0.4).astype(np.float32)
    x[x.sum(1) == 0, 0] = 1.0
    xp = np.vstack([x, np.zeros((20, f), np.float32)])  # heavy padding
    mask = np.zeros(n + 20, bool)
    mask[:n] = True
    k = jax.random.PRNGKey(0)
    a = tfidf_sample_features(k, jnp.asarray(x), s,
                              node_mask=jnp.ones(n, bool))
    b = tfidf_sample_features(k, jnp.asarray(xp), s,
                              node_mask=jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b)[:n])
