"""SymbolRans lossless backend: Huffman's model, rANS entropy coding.

Reference: include/mgard-x/Lossless/SymbolRans/SymbolRans.hpp — same
outlier-separated dict_size symbol model as Huffman, coded with rANS
(fractional bits -> always <= the Huffman size, no code-length cap).
"""

from __future__ import annotations

from . import rans


def encode(symbols, config) -> bytes:
    return rans.encode(symbols, int(config.huff_dict_size), int(config.huff_block_size))


def decode(data: bytes):
    return rans.decode(data)
