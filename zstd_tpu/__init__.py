"""zstd_tpu — a TPU-native Zstandard (RFC 8878) codec framework.

Built from scratch with the capability surface of the reference C library
(facebook/zstd v1.5.6): format-exact encode/decode, level ladder, streaming,
dictionaries, and a CLI — with the compute path designed for TPUs
(JAX/XLA/Pallas batched kernels, shard_map data parallelism) and host-side
orchestration in Python/C.

Top-level one-shot API (ZSTD_compress/ZSTD_decompress analog):

    import zstd_tpu
    blob = zstd_tpu.compress(data, level=3)
    data = zstd_tpu.decompress(blob)
"""

from .format.codec import (compress, compress_patch, decompress,
                           decompress_patch)
from .format.block import register_sequence_producer
from .format.frame import (compress_bound, find_frame_compressed_size,
                           get_dict_id_from_dict, get_dict_id_from_frame,
                           get_frame_content_size, is_frame)
from .errors import ZstdError, ZstdErrorCode
from .params import CParams, get_cparams
from .xxhash64 import xxh64

__version__ = "0.1.0"

__all__ = [
    "compress", "decompress", "compress_patch", "decompress_patch",
    "register_sequence_producer", "ZstdError", "ZstdErrorCode",
    "CParams", "get_cparams", "xxh64", "__version__",
    "compress_bound", "get_frame_content_size",
    "find_frame_compressed_size", "is_frame",
    "get_dict_id_from_frame", "get_dict_id_from_dict",
]
