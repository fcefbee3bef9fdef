"""shard_map import shim: jax.shard_map moved out of jax.experimental
(the experimental path emits a DeprecationWarning and will be removed)
and renamed its replication-check kwarg (check_rep -> check_vma).
Callers keep the old keyword; the shim adapts."""
try:
    from jax import shard_map as _smap  # jax >= 0.4.35

    def shard_map(f, mesh=None, in_specs=None, out_specs=None,
                  check_rep=True, **kw):
        return _smap(f, mesh=mesh, in_specs=in_specs,
                     out_specs=out_specs, check_vma=check_rep, **kw)
except ImportError:                      # pragma: no cover
    from jax.experimental.shard_map import shard_map  # noqa: F401
