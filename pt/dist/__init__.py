"""Multi-chip scaling: film-tile sharding over a jax.sharding.Mesh.
TPU-native replacement for the reference's multi-queue GPU parallelism
(DeviceContext.cpp:262-374) at the cross-chip scale."""

from pt.dist.mesh import (film_mesh, film_spp_mesh, render_image_sharded,
                          render_image_spp_sharded, render_spp_sharded)
