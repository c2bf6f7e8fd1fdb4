from .mesh import (
    batch_sharding,
    init_distributed,
    make_mesh,
    process_info,
    replicated,
)
