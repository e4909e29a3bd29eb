"""Multi-chip layer: mesh construction + sharded SpGEMM.

Replaces the reference's *simulated* parallel fabric — 256 PEs behind
tile crossbars exchanging partial products through DRAM
(``SimOuterSPACE.cpp:146-174, 721-857``) — with a real
``jax.sharding.Mesh`` + ``shard_map`` program whose communication is XLA
ICI collectives.
"""

from outerspace_tpu.shard.mesh import make_mesh  # noqa: F401
from outerspace_tpu.shard.spgemm_sharded import (  # noqa: F401
    shard_plan,
    spgemm_sharded,
)
from outerspace_tpu.shard.tiled import (  # noqa: F401
    shard_plan_tiled,
    sharded_tiled_to_csr,
    spgemm_sharded_tiled,
)
from outerspace_tpu.shard.mcl import (  # noqa: F401
    markov_cluster_sharded_device,
)
