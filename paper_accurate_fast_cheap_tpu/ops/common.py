"""Small numeric helpers shared by the recurrence ops."""
import jax.numpy as jnp


def as_f32(*xs):
    return tuple(x.astype(jnp.float32) for x in xs)


def revcumsum(x, axis):
    """Reverse (suffix) cumulative sum along ``axis``."""
    return jnp.flip(jnp.cumsum(jnp.flip(x, axis), axis), axis)
