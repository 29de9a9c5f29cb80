from occnet_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
from occnet_tpu.parallel.multihost import (  # noqa: F401
    allgather_host,
    barrier,
    global_batch,
    initialize,
    process_shard,
)
