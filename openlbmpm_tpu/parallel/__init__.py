"""Multi-chip domain decomposition over a jax.sharding.Mesh."""

from .halo import exchange_halo, make_sharded_stepper  # noqa: F401
from .mesh import make_mesh, domain_sharding, shard_domain  # noqa: F401
