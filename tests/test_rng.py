"""PCG RNG: bit-exactness vs the integer recurrence, plus sampler sanity."""

import numpy as np
import jax.numpy as jnp

from ray_tracing_extended_tpu.ops import rng
import reference_tracer as ref


def test_next_random_bit_exact_many_seeds():
    seeds = np.array(
        [0, 1, 2, 719393, 12345, 0xFFFFFFFF, 0xDEADBEEF, 31337], np.uint32
    )
    state = jnp.asarray(seeds)
    for _ in range(64):
        state, out = rng.next_random(state)
        for i, s in enumerate(seeds):
            seeds[i], expected = _np_step(int(seeds[i]))
            assert int(out[i]) == expected
            assert int(state[i]) == seeds[i]


def _np_step(s: int):
    return ref.next_random(s)


def test_random_value_matches_scalar():
    state = jnp.asarray(np.array([42, 9999], np.uint32))
    s0, s1 = 42, 9999
    for _ in range(32):
        state, v = rng.random_value(state)
        s0, v0 = ref.random_value(s0)
        s1, v1 = ref.random_value(s1)
        assert float(v[0]) == float(v0)
        assert float(v[1]) == float(v1)


def test_random_value_range_and_mean():
    state = jnp.asarray(np.arange(4096, dtype=np.uint32))
    state, v = rng.random_value(state)
    v = np.asarray(v)
    assert (v >= 0).all() and (v <= 1).all()
    assert abs(v.mean() - 0.5) < 0.02


def test_random_direction_unit_and_consumption():
    state = jnp.asarray(np.arange(1024, dtype=np.uint32))
    new_state, d = rng.random_direction(state)
    d = np.asarray(d)
    assert np.allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)
    # isotropy: component means near zero
    assert np.abs(d.mean(axis=0)).max() < 0.1
    # consumes exactly 6 draws
    s = state
    for _ in range(6):
        s, _ = rng.next_random(s)
    assert np.array_equal(np.asarray(s), np.asarray(new_state))


def test_random_direction_matches_scalar():
    s_jax = jnp.asarray(np.array([7], np.uint32))
    _, d = rng.random_direction(s_jax)
    _, d_ref = ref.random_direction(7)
    # transcendentals (cos/log) differ at ulp level between XLA and NumPy
    assert np.allclose(np.asarray(d)[0], d_ref, atol=1e-4)


def test_point_in_circle_in_disc_and_matches_scalar():
    state = jnp.asarray(np.arange(2048, dtype=np.uint32))
    _, p = rng.random_point_in_circle(state)
    p = np.asarray(p)
    assert (np.linalg.norm(p, axis=1) <= 1.0 + 1e-6).all()
    _, p_ref = ref.random_point_in_circle(123)
    _, p_jax = rng.random_point_in_circle(jnp.asarray(np.array([123], np.uint32)))
    assert np.allclose(np.asarray(p_jax)[0], p_ref, atol=1e-4)


def test_seed_layout():
    s = rng.seed(jnp.asarray([5], dtype=jnp.uint32), jnp.uint32(3))
    assert int(s[0]) == (5 + 3 * 719393) & 0xFFFFFFFF
    # uint32 wraparound
    s = rng.seed(jnp.asarray([0xFFFFFFFF], dtype=jnp.uint32), jnp.uint32(70000))
    assert int(s[0]) == (0xFFFFFFFF + 70000 * 719393) % (1 << 32)
