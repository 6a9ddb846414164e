"""Multi-chip domain decomposition over a jax.sharding.Mesh."""

from .mesh import make_mesh, domain_sharding, shard_domain  # noqa: F401
