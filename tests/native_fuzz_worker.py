"""Decode a list of (possibly corrupt) TIFFs through the native batch
decoder; any crash kills this subprocess, which the driver detects."""
import sys
import numpy as np
from unet_tpu import native

h, w, c, dt = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
assert native.available()
for path in sys.argv[5:]:
    for fn in ("raw", "f32", "mask"):
        try:
            if fn == "raw":
                native.decode_batch_raw([path], h, w, c, np.dtype(dt), n_threads=1)
            elif fn == "f32":
                native.decode_batch([path], h, w, c, n_threads=1)
            else:
                native.decode_masks([path], h, w, n_threads=1)
        except RuntimeError:
            pass
print("ALIVE")
