"""Batch re-render the tactile stream of an existing dump on the accelerator.

Reads every ``depth_*.png`` under ``<root>/dataset/**``, reconstructs the
clipped depth buffers, and renders the corresponding tactile images in one
batched jitted pass (sim/tactile_jax.py) — e.g. to regenerate a corpus with
different light intensities without re-running physics, or to benchmark
accelerator shading throughput against the host pipeline (the reference
shades per-frame in NumPy: tact_sim/tactile/shader.py:78-129).

    python tools/rerender_dataset.py --dataset data_runs/exp1_full \
        [--suffix ""] [--thickness 0.005] [--i-diffuse 2.0] [--i-specular 2.0]

Assumes the dump came from a static sensor with the exp CLI camera geometry
(the sensor pose is not stored in the dumps; pass --size/--position to match
a non-default run). Depth PNGs quantise the buffer to uint8, so re-rendered
images can differ from the originals by a few counts — exact parity is the
job of --device-render at generation time, not of this tool.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True,
                    help="dump root (containing dataset/**/depth_*.png)")
    ap.add_argument("--suffix", default="",
                    help="output name suffix: tactile{suffix}_NNNN.png "
                         "(empty = overwrite the tactile stream). A non-empty "
                         "suffix is forced to start with '-' so the output "
                         "never matches the dataset compiler's tactile_*.png "
                         "glob (a '_re' suffix would corrupt frame counts)")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=float, nargs=3, default=[1.5, 1.5, 1.0])
    ap.add_argument("--position", type=float, nargs=3, default=[0, 0, 0.5])
    ap.add_argument("--thickness", type=float, default=0.005)
    ap.add_argument("--i-diffuse", type=float, default=2.0)
    ap.add_argument("--i-specular", type=float, default=2.0)
    ap.add_argument("--platform", default=None,
                    help="jax platform override (e.g. cpu)")
    args = ap.parse_args()

    if args.platform:
        import os
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax
        jax.config.update("jax_platform_name", args.platform)

    import cv2

    from mmdyn_tpu.sim.physics import AnalyticBackend
    from mmdyn_tpu.sim.sensor import make_sensor
    from mmdyn_tpu.sim.tactile_jax import TactileRendererJax

    backend = AnalyticBackend()
    sensor = make_sensor(backend, size=list(args.size),
                         position=list(args.position), sensor_vector=[0, 0, 1],
                         thickness=args.thickness)
    sensor.get_sensor_image()   # sets the view matrix
    sensor._set_lights(i_specular=args.i_specular, i_diffuse=args.i_diffuse)
    renderer = TactileRendererJax.from_sensor(sensor)

    if args.suffix and not args.suffix.startswith("-"):
        args.suffix = "-" + args.suffix.lstrip("_")
    root = Path(args.dataset).expanduser() / "dataset"
    depths = sorted(root.glob("**/depth_*.png"))
    if not depths:
        sys.exit(f"no depth_*.png under {root}")

    n, t0 = 0, time.perf_counter()
    for i in range(0, len(depths), args.batch):
        group = depths[i:i + args.batch]
        # save_image wrote (buffer * 255).astype(uint8); invert the quantise
        batch = np.stack([
            cv2.imread(str(p), cv2.IMREAD_GRAYSCALE).astype(np.float32) / 255.0
            for p in group])
        if len(group) < args.batch:
            # pad the tail to the full batch shape so it reuses the same
            # compiled program (a fresh remote compile costs 25-300 s here)
            batch = np.concatenate(
                [batch, np.repeat(batch[-1:], args.batch - len(group), 0)])
        imgs = np.asarray(renderer(batch)[:len(group)])
        for img, p in zip(imgs, group):
            out = p.with_name(p.name.replace(
                "depth_", f"tactile{args.suffix}_"))
            cv2.imwrite(str(out), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
            n += 1
    dt = time.perf_counter() - t0
    print(json.dumps({"frames": n, "seconds": round(dt, 2),
                      "frames_per_sec": round(n / dt, 1)}))


if __name__ == "__main__":
    main()
