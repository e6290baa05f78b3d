"""Device meshes and sharding helpers.

The reference has no distributed execution at all (SURVEY.md §2.2); here
parallelism is first-class: a 1-D ('data',) mesh shards the frame/image
batch axis across ICI-connected chips and GSPMD inserts the collectives.
The mesh helper accepts a ('data', 'model') shape for future model-parallel
configurations, shipped 1-way at EfficientDet-Lite size.
"""

from vbt_tpu.parallel.mesh import batch_sharding, make_mesh, replicated

__all__ = ["make_mesh", "batch_sharding", "replicated"]
