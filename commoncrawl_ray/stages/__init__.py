"""map_batches stages (stateless kernels) + actor-pool stage classes."""
