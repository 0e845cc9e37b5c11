"""Device-batch helpers.

Everything under jit compiles per SHAPE: a stream tail smaller than the
steady batch size triggers a whole extra XLA compile of every op it
touches (tens of seconds on remote/tunneled devices, and a cache entry
per distinct tail length). `pad_tail` pads a short final batch to the
steady shape by repeating the last element; callers slice the outputs
back to the true length. Correct whenever the op is causal/local along
the batch axis (scene metric scans, stencil filters, per-frame maps):
appended copies cannot influence earlier outputs.
"""

from __future__ import annotations

import numpy as np


def pad_tail(items: list, batch: int):
    """(stacked_array, true_count): stack `items` and pad to `batch`
    rows by repeating the last item. No-op stack when already full."""
    n = len(items)
    arr = np.stack(items)
    if n >= batch:
        return arr, n
    pad = np.repeat(arr[-1:], batch - n, axis=0)
    return np.concatenate([arr, pad], axis=0), n
