#!/usr/bin/env python
"""A/B the MXU permutation-conv space_to_depth/depth_to_space on the real chip.

The tpu_opt stem's depth_to_space and the last_cross space_to_depth are the
two remaining 6-D reshape+transpose sites in the flagship step (the round-3
donation audit measured their fwd+bwd layout pair at ~536 MB/step).
``layers.depth_to_space_mxu`` / ``space_to_depth_mxu`` express the same
permutation as constant one-hot convs, keeping the data movement inside the
conv engine (bit-exact — tests/test_models.py pins equality).

Runs bench_train(tpu_opt) alternating variant per repetition so tunnel /
clock drift hits both arms equally.
"""

import sys

sys.path.insert(0, ".")

from unet_tpu.bench import bench_train  # noqa: E402
from unet_tpu.models import layers, unet, xresnet  # noqa: E402


def set_variant(mxu: bool) -> None:
    unet.space_to_depth_mxu = (
        layers.space_to_depth_mxu if mxu else layers.space_to_depth)
    xresnet.depth_to_space_mxu = (
        layers.depth_to_space_mxu if mxu else
        lambda x, r=2: layers.depth_to_space(x, r))


def main() -> None:
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    results = {True: [], False: []}
    for rep in range(reps):
        for mxu in (True, False) if rep % 2 == 0 else (False, True):
            set_variant(mxu)
            r = bench_train(tile=512, batch_size=bs, steps=24)
            results[mxu].append(r["step_ms"])
            print(f"rep{rep} mxu={mxu}: {r['step_ms']:.2f} ms "
                  f"({r['tiles_per_sec_per_chip']:.1f} t/s)", flush=True)
    for mxu, ms in results.items():
        best = min(ms)
        print(f"variant mxu={mxu}: best {best:.2f} ms, all {ms}")


if __name__ == "__main__":
    main()
