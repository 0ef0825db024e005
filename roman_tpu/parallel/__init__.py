from roman_tpu.parallel.mesh import get_mesh, shard_pairs  # noqa: F401
