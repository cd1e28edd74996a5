"""ECO embedding-corruption library (reference: methods/eco/corrupt.py:4-253).

All 14 operations, as *pure* jnp functions — the reference mutates the
embedding tensor inside a forward hook; here each op maps
``(data [B,S,D], pos [B,S], dims, strength, key)`` → new data, applied only
where ``pos`` marks attack tokens.  Randomness is explicit (PRNG key), so
corruption under jit is reproducible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _mask3(data, pos):
    return pos.astype(bool)[..., None]


def _first_n_mask(data, dims):
    d = jnp.arange(data.shape[-1]) < dims
    return d[None, None, :]


def _topk_mask(data, dims, largest=True, by_abs=True):
    """Boolean mask of the per-position top-k (|value| by default)."""
    v = jnp.abs(data) if by_abs else data
    v = v if largest else -v
    kth = jnp.sort(v, axis=-1)[..., -dims]
    return v >= kth[..., None]


def rand_noise_first_n(data, pos, dims, strength, key):
    noise = jax.random.normal(key, data.shape, data.dtype) * strength
    m = _mask3(data, pos) & _first_n_mask(data, dims)
    return data + jnp.where(m, noise, 0)


def rand_noise_rand_n(data, pos, dims, strength, key):
    k1, k2 = jax.random.split(key)
    sel = jax.random.permutation(k1, data.shape[-1])[:dims]
    dim_mask = jnp.zeros(data.shape[-1], bool).at[sel].set(True)[None, None, :]
    noise = jax.random.normal(k2, data.shape, data.dtype) * strength
    return data + jnp.where(_mask3(data, pos) & dim_mask, noise, 0)


def rand_noise_top_k(data, pos, dims, strength, key):
    noise = jax.random.normal(key, data.shape, data.dtype) * strength
    m = _mask3(data, pos) & _topk_mask(data, dims)
    return data + jnp.where(m, noise, 0)


def zero_out_top_k(data, pos, dims, strength=None, key=None):
    m = _mask3(data, pos) & _topk_mask(data, dims)
    return jnp.where(m, 0.0, data)


def zero_out_first_n(data, pos, dims, strength=None, key=None):
    m = _mask3(data, pos) & _first_n_mask(data, dims)
    return jnp.where(m, 0.0, data)


def flip_sign_first_n(data, pos, dims, strength=None, key=None):
    m = _mask3(data, pos) & _first_n_mask(data, dims)
    return jnp.where(m, -data, data)


def flip_sign_top_k(data, pos, dims, strength=None, key=None):
    m = _mask3(data, pos) & _topk_mask(data, dims)
    return jnp.where(m, -data, data)


def sub_value_top_k(data, pos, dims, strength, key=None):
    m = _mask3(data, pos) & _topk_mask(data, dims, by_abs=False)  # largest values
    return jnp.where(m, data - strength, data)


def add_value_least_k(data, pos, dims, strength, key=None):
    m = _mask3(data, pos) & _topk_mask(data, dims, largest=False, by_abs=False)
    return jnp.where(m, data + strength, data)


def sub_value_first_n(data, pos, dims, strength, key=None):
    m = _mask3(data, pos) & _first_n_mask(data, dims)
    return jnp.where(m, data - strength, data)


def add_value_first_n(data, pos, dims, strength, key=None):
    m = _mask3(data, pos) & _first_n_mask(data, dims)
    return jnp.where(m, data + strength, data)


def set_rand_noise_first_n(data, pos, dims, strength, key):
    """The reference assigns its noise_expanded buffer into
    ``data[:, :, :dims]`` for ALL positions (corrupt.py:214): attack
    positions get the noise, every OTHER position gets the buffer's zeros —
    non-attack rows are zeroed in the first dims too.  Kept faithfully."""
    noise = jax.random.normal(key, data.shape, data.dtype) * strength
    fn = _first_n_mask(data, dims)
    pm = _mask3(data, pos)
    return jnp.where(fn, jnp.where(pm, noise, 0.0), data)


def reverse_order(data, pos=None, dims=None, strength=None, key=None):
    return jnp.flip(data, axis=1)


def shuffle(data, pos=None, dims=None, strength=None, key=None):
    order = jax.random.permutation(key, data.shape[1])
    return data[:, order, :]


corrupt_methods = {
    "rand_noise_first_n": rand_noise_first_n,
    "rand_noise_top_k": rand_noise_top_k,
    "zero_out_top_k": zero_out_top_k,
    "flip_sign_first_n": flip_sign_first_n,
    "flip_sign_top_k": flip_sign_top_k,
    "sub_value_top_k": sub_value_top_k,
    "add_value_least_k": add_value_least_k,
    "set_rand_noise_first_n": set_rand_noise_first_n,
    "rand_noise_rand_n": rand_noise_rand_n,
    "zero_out_first_n": zero_out_first_n,
    "reverse_order": reverse_order,
    "shuffle": shuffle,
    "sub_value_first_n": sub_value_first_n,
    "add_value_first_n": add_value_first_n,
}
