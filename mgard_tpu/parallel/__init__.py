from .pipeline import (  # noqa: F401
    compress_shards_device,
    make_subdomain_mesh,
    quantizers_ingraph,
)
