"""Device-mesh parallelism: sharded bundle adjustment, data-parallel
frontend, pipelined window scheduling."""
