"""Zero-copy ingestion of Arrow embedding columns into numpy.

``list<float>`` / ``fixed_size_list<float>`` columns must become
(n, dim) matrices without a per-row Python ``to_pylist()`` pass
(VERDICT r2 #5): flatten the child values buffer (one memcpy at most,
zero-copy when the buffer is contiguous and null-free) and reshape.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def list_to_matrix(col, dtype=np.float64) -> np.ndarray:
    """Arrow list-of-number column -> (n, dim) numpy matrix.

    Requires every list to have the same length (an embedding column
    invariant); raises ValueError otherwise instead of silently
    misreshaping.
    """
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if pa.types.is_fixed_size_list(arr.type):
        dim = arr.type.list_size
    else:
        offsets = arr.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offsets)
        dim = int(widths[0])
        if not (widths == dim).all():
            raise ValueError("ragged list column; expected constant-dim vectors")
    # flatten() honours slices/offsets; to_numpy is zero-copy for a
    # null-free primitive child
    vals = arr.flatten().to_numpy(zero_copy_only=False)
    return vals.reshape(n, dim).astype(dtype, copy=False)
