"""RLE_DICTIONARY index pages.

Wire shape matches the reference's dictionary data pages
(/root/reference/page_v1.go:184-191, type_dict.go:10-60): one byte of bit
width, then the indices as an RLE/bit-packed hybrid stream. The dictionary
values themselves live in a separate PLAIN-encoded dictionary page
(/root/reference/chunk_writer.go:130-152) — handled by the column writer, not
here.

Dictionary *construction* in our engine uses Arrow's vectorized
``dictionary_encode`` at the column-writer layer; this module only turns
index arrays into bytes and back.
"""

from __future__ import annotations

import numpy as np

from . import hybrid
from .bitpack import bit_width


def encode_indices(indices: np.ndarray, num_dict_values: int) -> bytes:
    width = bit_width(max(num_dict_values - 1, 0))
    return bytes([width]) + hybrid.encode(np.asarray(indices), width)


def decode_indices(data, count: int) -> np.ndarray:
    buf = bytes(data)
    width = buf[0]
    return hybrid.decode(buf[1:], width, count).astype(np.int32)
