"""Device-mesh parallelism — a new capability vs. the reference, which pins
single GPUs per process with no communication (SURVEY.md §2.3).

  * mesh.py    — mesh construction + sharding rules (data / width axes)
  * dp.py      — data-parallel train/eval steps (batch sharded over `data`,
                 params replicated; XLA inserts the gradient all-reduce)
  * fsdp.py    — ZeRO-3 sharded train state over `data` (the 64x256 configs'
                 9.7-9.9 GB states stop fitting replicated past ~2 chips of
                 activations; GSPMD inserts all-gather/reduce-scatter)
  * spatial.py — width-sharded spatial parallelism with cyclic halo exchange
                 via lax.ppermute (the 360-degree wraparound makes a ring
                 the natural topology, SURVEY.md §5)
"""

from skyhdr.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated,
)
from skyhdr.parallel.dp import make_parallel_gan_train_step  # noqa: F401
from skyhdr.parallel.fsdp import (  # noqa: F401
    fsdp_state_sharding,
    make_fsdp_gan_train_step,
    make_fsdp_sun_train_step,
)
from skyhdr.parallel.spatial import ring_conv2d, ring_deformable_conv2d  # noqa: F401
