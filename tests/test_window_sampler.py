"""Window-sampler correctness: balance, membership, deficit handling."""

import numpy as np

import jax
import jax.numpy as jnp

from deepsdf_tpu.data.dataset import (
    DevicePools, sample_scenes, sample_scenes_auto, sample_scenes_window,
)


def make_pools(counts_pos, counts_neg, pool_size=64, width=4, seed=0):
    rng = np.random.default_rng(seed)
    S = len(counts_pos)
    pos = np.zeros((S, pool_size, width), np.float32)
    neg = np.zeros((S, pool_size, width), np.float32)
    for s in range(S):
        # unique identifiable rows: value encodes (scene, row, sign)
        p = rng.normal(size=(counts_pos[s], width)).astype(np.float32)
        p[:, 3] = np.abs(p[:, 3]) + 1e-3
        n = rng.normal(size=(counts_neg[s], width)).astype(np.float32)
        n[:, 3] = -np.abs(n[:, 3]) - 1e-3
        pos[s, :counts_pos[s]] = p
        pos[s, counts_pos[s]:] = p[0] if counts_pos[s] else 0
        neg[s, :counts_neg[s]] = n
        neg[s, counts_neg[s]:] = n[0] if counts_neg[s] else 0
    return DevicePools(
        pos=jnp.asarray(pos), neg=jnp.asarray(neg),
        pos_counts=jnp.asarray(counts_pos, jnp.int32),
        neg_counts=jnp.asarray(counts_neg, jnp.int32)), pos, neg


def test_window_balance_and_membership():
    pools, pos, neg = make_pools([60, 50, 40], [55, 45, 64])
    out = np.asarray(sample_scenes_window(
        pools, jnp.arange(3, dtype=jnp.int32), jax.random.PRNGKey(0), 32))
    assert out.shape == (3, 32, 4)
    for s in range(3):
        rows = out[s]
        assert (rows[:16, 3] > 0).all() and (rows[16:, 3] < 0).all()
        # every pos row must be one of the scene's REAL pos rows
        real = pos[s][: int(pools.pos_counts[s])]
        for r in rows[:16]:
            assert np.isclose(real, r[None, :], atol=0).all(axis=1).any()


def test_window_deficit_rebalance():
    # scene 0: only 5 neg rows < half=16 ⇒ pos_len = 32-5 = 27
    pools, pos, neg = make_pools([60], [5])
    out = np.asarray(sample_scenes_window(
        pools, jnp.asarray([0], jnp.int32), jax.random.PRNGKey(1), 32))
    signs = out[0, :, 3] > 0
    assert signs.sum() == 27 and (~signs).sum() == 5
    # the 5 neg rows are exactly the real ones
    real_neg = neg[0][:5]
    got_neg = out[0][~signs]
    for r in got_neg:
        assert np.isclose(real_neg, r[None, :], atol=0).all(axis=1).any()


def test_auto_selector_falls_back():
    # pool narrower than the window target → gather path (same shape out)
    pools, *_ = make_pools([60, 60], [60, 60], pool_size=64)
    out = sample_scenes_auto(pools, jnp.arange(2, dtype=jnp.int32),
                             jax.random.PRNGKey(2), 200)  # target 200 > 64
    assert out.shape == (2, 200, 4)
    out2 = sample_scenes_auto(pools, jnp.arange(2, dtype=jnp.int32),
                              jax.random.PRNGKey(2), 32)  # window path
    assert out2.shape == (2, 32, 4)
    np.testing.assert_array_equal(
        np.asarray(out2),
        np.asarray(sample_scenes_window(pools, jnp.arange(2, dtype=jnp.int32),
                                        jax.random.PRNGKey(2), 32)))


def test_windows_vary_across_keys():
    pools, *_ = make_pools([64], [64])
    a = np.asarray(sample_scenes_window(pools, jnp.asarray([0], jnp.int32),
                                        jax.random.PRNGKey(1), 32))
    b = np.asarray(sample_scenes_window(pools, jnp.asarray([0], jnp.int32),
                                        jax.random.PRNGKey(2), 32))
    assert np.abs(a - b).max() > 0


def test_window_tail_rows_reachable_with_extra_padding():
    """Regression: with width ≥ count + target, EVERY pool row must be
    drawable. The old code let jax.lax.dynamic_slice silently clamp the
    window start, making the last (count − (width − target) − len) rows
    of near-full pools unreachable and piling ~20% of draws onto one
    fixed window (the default device training path)."""
    count, target = 60, 32
    # width = count + target (what load_device_pools(window_extra=target) gives)
    pools, pos, neg = make_pools([count], [count], pool_size=count + target)
    seen = set()
    for k in range(400):
        out = np.asarray(sample_scenes_window(
            pools, jnp.asarray([0], jnp.int32), jax.random.PRNGKey(k), target))[0]
        for row in out:
            if row[3] > 0:
                (idx,) = np.where(np.isclose(pos[0][:count], row[None, :],
                                             atol=0).all(axis=1))[:1] or (None,)
                if idx is not None:
                    seen.add(int(np.atleast_1d(idx)[0]))
    assert seen == set(range(count)), sorted(set(range(count)) - seen)


def test_window_start_respects_slice_bounds():
    """With a too-narrow pool the explicit bound (not dynamic_slice's
    silent clamp) must cap the start: all drawn rows are real rows."""
    count, target, pool_size = 60, 32, 64
    pools, pos, neg = make_pools([count], [count], pool_size=pool_size)
    for k in range(50):
        out = np.asarray(sample_scenes_window(
            pools, jnp.asarray([0], jnp.int32), jax.random.PRNGKey(k), target))[0]
        for row in out[row_sign(out) > 0] if False else out:
            pool = pos[0][:count] if row[3] > 0 else neg[0][:count]
            assert np.isclose(pool, row[None, :], atol=0).all(axis=1).any()


def row_sign(out):
    return out[:, 3]


def test_load_device_pools_window_extra(tmp_path):
    """The training loop passes window_extra=SamplesPerScene so padded
    width ≥ max_count + target and every window start stays in bounds."""
    import json, os
    from deepsdf_tpu.data.dataset import load_device_pools

    d = tmp_path / "ds" / "SdfSamples" / "a" / "b"
    os.makedirs(d)
    rng = np.random.default_rng(0)
    for name, n in (("s0", 1500), ("s1", 900)):
        np.savez(d / f"{name}.npz",
                 pos=rng.normal(size=(n, 4)).astype(np.float32),
                 neg=rng.normal(size=(n // 2, 4)).astype(np.float32))
    split = {"a": {"b": ["s0", "s1"]}}
    pools = load_device_pools(str(tmp_path / "ds"), split, 3, window_extra=800)
    assert pools.pos.shape[1] >= 1500 + 800
    assert pools.neg.shape[1] >= 750 + 800
    assert int(pools.pos_counts[0]) == 1500 and int(pools.neg_counts[1]) == 450
