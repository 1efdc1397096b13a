from .sharded import make_spatial_mesh, sharded_consensus_and_rank  # noqa: F401
