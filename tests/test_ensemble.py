"""Temporal-ensemble tests against an independent numpy restatement of the
reference's rolling-buffer semantics (contract: test.py:637-692)."""

import jax.numpy as jnp
import numpy as np

from tracknetv3_tpu.ops.ensemble import (
    ensemble_flush,
    ensemble_init,
    ensemble_offline,
    ensemble_update,
    get_ensemble_weight,
)


def _np_reference_ensemble(windows, weights):
    """Direct per-frame restatement: frame t = combination of windows
    s in [t-L+1, t] at offset t-s. Warm-up (t < L-1) and tail (t >= S)
    use the unweighted mean of available windows; otherwise contribution
    of offset j gets weight[L-1-j]."""
    S, L = windows.shape[:2]
    T = S + L - 1
    out = np.zeros((T,) + windows.shape[2:], np.float64)
    for t in range(T):
        s_lo, s_hi = max(0, t - L + 1), min(S - 1, t)
        contribs = [windows[s, t - s] for s in range(s_lo, s_hi + 1)]
        if t < L - 1 or t >= S:
            out[t] = np.mean(contribs, axis=0)
        else:
            out[t] = sum(
                weights[L - 1 - (t - s)] * windows[s, t - s]
                for s in range(s_lo, s_hi + 1)
            )
    return out


def test_weights_match_reference_values():
    np.testing.assert_allclose(
        get_ensemble_weight(8, "weight"),
        np.array([1, 2, 3, 4, 4, 3, 2, 1], np.float32) / 20.0,
    )
    np.testing.assert_allclose(get_ensemble_weight(5, "average"), np.full(5, 0.2))
    np.testing.assert_allclose(
        get_ensemble_weight(5, "weight"), np.array([1, 2, 3, 2, 1]) / 9.0
    )


def test_offline_matches_numpy_reference():
    rng = np.random.default_rng(0)
    S, L = 13, 4
    windows = rng.uniform(0, 1, size=(S, L, 6, 10)).astype(np.float32)
    w = get_ensemble_weight(L, "weight")
    got = np.asarray(ensemble_offline(jnp.asarray(windows), jnp.asarray(w)))
    want = _np_reference_ensemble(windows, w)
    assert got.shape == (S + L - 1, 6, 10)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_streaming_batches_equal_offline():
    rng = np.random.default_rng(1)
    S, L = 17, 8
    windows = rng.uniform(0, 1, size=(S, L, 2)).astype(np.float32)
    w = jnp.asarray(get_ensemble_weight(L, "weight"))

    offline = np.asarray(ensemble_offline(jnp.asarray(windows), w))

    state = ensemble_init(L, (2,))
    frames = []
    for start in range(0, S, 5):  # uneven batches (5,5,5,2)
        batch = jnp.asarray(windows[start : start + 5])
        state, out = ensemble_update(state, batch, w)
        frames.append(np.asarray(out))
    tail = np.asarray(ensemble_flush(state))
    got = np.concatenate(frames + [tail], axis=0)
    np.testing.assert_allclose(got, offline, atol=1e-6)


def test_short_video_fewer_windows_than_seq_len():
    rng = np.random.default_rng(2)
    S, L = 3, 8  # S < L: every frame is warm-up or tail
    windows = rng.uniform(0, 1, size=(S, L, 1)).astype(np.float32)
    w = get_ensemble_weight(L, "average")
    got = np.asarray(ensemble_offline(jnp.asarray(windows), jnp.asarray(w)))
    want = _np_reference_ensemble(windows, w)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_chunked_stateless_matches_offline():
    """ensemble_chunk over overlapped chunks == the offline ensemble."""
    from tracknetv3_tpu.ops.ensemble import ensemble_chunk

    rng = np.random.default_rng(3)
    T, L, B = 41, 8, 16
    S = T - L + 1
    windows = rng.uniform(0, 1, size=(S, L, 4)).astype(np.float32)
    w = jnp.asarray(get_ensemble_weight(L, "weight"))
    offline = np.asarray(ensemble_offline(jnp.asarray(windows), w))[:T]

    got = []
    for t0 in range(0, T, B):
        # rows k = window t0-L+1+k; out-of-range rows are garbage (zeros
        # here) and masked inside ensemble_chunk
        rows = []
        for k in range(B + L - 1):
            wi = t0 - L + 1 + k
            rows.append(windows[wi] if 0 <= wi < S else np.zeros((L, 4), np.float32))
        chunk = jnp.asarray(np.stack(rows))
        out = np.asarray(ensemble_chunk(chunk, w, jnp.int32(t0), jnp.int32(S)))
        got.append(out[: min(B, T - t0)])
    got = np.concatenate(got)
    np.testing.assert_allclose(got, offline, atol=1e-5)


def test_chunk_garbage_rows_do_not_leak():
    """Out-of-range window rows must not affect valid frames."""
    from tracknetv3_tpu.ops.ensemble import ensemble_chunk

    rng = np.random.default_rng(4)
    L, B, S = 4, 6, 20
    w = jnp.asarray(get_ensemble_weight(L, "average"))
    t0 = 0
    rows_clean = np.zeros((B + L - 1, L, 2), np.float32)
    rows_dirty = rng.uniform(5, 9, size=(B + L - 1, L, 2)).astype(np.float32)
    for k in range(B + L - 1):
        wi = t0 - L + 1 + k
        if 0 <= wi < S:
            v = rng.uniform(0, 1, size=(L, 2)).astype(np.float32)
            rows_clean[k] = v
            rows_dirty[k] = v
    a = np.asarray(ensemble_chunk(jnp.asarray(rows_clean), w, jnp.int32(t0), jnp.int32(S)))
    b = np.asarray(ensemble_chunk(jnp.asarray(rows_dirty), w, jnp.int32(t0), jnp.int32(S)))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_constant_input_is_identity():
    S, L = 20, 8
    windows = np.full((S, L, 3, 3), 0.42, np.float32)
    w = get_ensemble_weight(L, "weight")
    out = np.asarray(ensemble_offline(jnp.asarray(windows), jnp.asarray(w)))
    np.testing.assert_allclose(out, 0.42, atol=1e-6)
