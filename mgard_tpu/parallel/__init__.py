from .mdr_sharded import (  # noqa: F401
    MDReconstructSharded,
    MDRefactorSharded,
)
from .pipeline import (  # noqa: F401
    compress_sharded,
    compress_shards_device,
    compress_shards_symbols,
    decompress_sharded,
    make_subdomain_mesh,
    quantizers_ingraph,
)
