"""shard_map import shim: jax.shard_map moved out of jax.experimental
(the experimental path emits a DeprecationWarning and will be removed);
fall back for older jax versions."""
try:
    from jax import shard_map  # jax >= 0.4.35
except ImportError:                      # pragma: no cover
    from jax.experimental.shard_map import shard_map  # noqa: F401
