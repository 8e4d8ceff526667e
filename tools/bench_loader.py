"""Input-pipeline benchmark: JPEG decode -> SceneLoader scenes/sec.

The reference loads N camera JPEGs per scene on the training/eval hot path
(`/root/reference/vfa/data/dataset.py:60-68`, PIL inside a torch DataLoader).
This tool answers whether vfa_tpu's loader can feed the device at the bench
throughput (72 scenes/sec at MultiviewC scale = ~504 720x1280 decodes/sec):

  1. generates a synthetic on-disk JPEG dataset at the real camera geometry
     (photographic-complexity frames — smooth background + textured blobs —
     so libjpeg entropy-decode cost is realistic, not blank-image fast);
  2. measures raw single-image decode rate for the PIL and native
     (native/imageio.cpp, GIL-free) backends;
  3. measures end-to-end SceneLoader scenes/sec across thread counts
     (batched, prefetching, decode-into-slot);
  4. reports the host-core requirement for a target scenes/sec.

Prints one JSON line per measurement. Run anywhere (pure host benchmark;
no device needed). See also `bench.py --from_disk` for the overlapped
loader+TPU measurement.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from vfa_tpu.config import get_config  # noqa: E402
from vfa_tpu.data.frame_dataset import FrameDataset, SceneLoader  # noqa: E402


def make_frame(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    """A JPEG with photographic statistics: low-frequency background,
    mid-frequency texture, and hard-edged 'objects' — decode cost tracks
    entropy-coded bits, so blank test images would understate it."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([
        120 + 60 * np.sin(yy / 97.0) + 40 * np.cos(xx / 131.0),
        110 + 50 * np.cos(yy / 71.0 + 1.0) + 45 * np.sin(xx / 89.0),
        100 + 55 * np.sin((xx + yy) / 113.0),
    ], axis=-1)
    # textured blobs (cheap stand-ins for people/cattle/clutter)
    for _ in range(24):
        cy, cx = rng.integers(0, h), rng.integers(0, w)
        rh, rw = rng.integers(20, 90), rng.integers(15, 60)
        y0, y1 = max(0, cy - rh), min(h, cy + rh)
        x0, x1 = max(0, cx - rw), min(w, cx + rw)
        img[y0:y1, x0:x1] += rng.normal(0, 28, (y1 - y0, x1 - x0, 3))
    img += rng.normal(0, 6, img.shape)  # sensor noise: fills AC coefficients
    return np.clip(img, 0, 255).astype(np.uint8)


def ensure_dataset(root: str, frames: int, cams: int, size, quality: int):
    """cam{c}/{f:05d}.jpg tree; returns fpaths {cam: {frame: path}}."""
    from PIL import Image

    h, w = size
    fpaths = {}
    todo = []
    for cam in range(1, cams + 1):
        d = os.path.join(root, f"cam{cam}")
        os.makedirs(d, exist_ok=True)
        fpaths[cam] = {}
        for f in range(frames):
            p = os.path.join(d, f"{f:05d}.jpg")
            fpaths[cam][f] = p
            if not os.path.isfile(p):
                todo.append((cam, f, p))
    if todo:
        t0 = time.perf_counter()
        for cam, f, p in todo:
            rng = np.random.default_rng(cam * 100003 + f)
            Image.fromarray(make_frame(rng, h, w)).save(p, quality=quality)
        print(f"# wrote {len(todo)} jpegs ({time.perf_counter() - t0:.0f}s, "
              f"{os.path.getsize(p) / 1e3:.0f} KB each)", file=sys.stderr)
    return fpaths


class DiskFrames(FrameDataset):
    """FrameDataset over a bare on-disk JPEG tree (no annotations): empty
    labels / zero heatmaps, real image decode path. Duck-type compatible
    with SceneLoader."""

    def __init__(self, cfg, fpaths, num_frames: int, backend: str):
        self.cfg = cfg
        self.image_backend = backend
        self.num_cam = len(fpaths)
        self.frame_range = range(num_frames)
        self.fpaths = fpaths
        self.labels = [[] for _ in range(num_frames)]
        L, W = cfg.grid_shape
        self.heatmaps = [np.zeros((L, W), np.float32)] * num_frames
        self.calibs = np.zeros((self.num_cam, 3, 4), np.float32)
        self.grid = np.zeros((L, W, 3), np.float32)
        self.dim_mean = None


def bench_raw(fpaths, cams, frames, size, backend, dtype=np.float32,
              seconds=6.0):
    from vfa_tpu.native.imageio import load_image

    paths = [fpaths[cam][f] for f in range(frames) for cam in
             range(1, cams + 1)]
    out = np.empty((*size, 3), dtype)
    # warm page cache + backend init
    load_image(paths[0], size, backend, out=out)
    n, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        load_image(paths[n % len(paths)], size, backend, out=out)
        n += 1
    dt = time.perf_counter() - t0
    return n / dt


def bench_loader(ds, batch_size, threads, dtype=np.float32, min_scenes=48,
                 augment=None):
    loader = SceneLoader(ds, batch_size=batch_size, shuffle=False,
                         num_threads=threads, max_objects=8,
                         images_dtype=dtype, augment=augment)
    for b in loader:  # warm: page cache, thread pool, staging-ring pages
        if augment is not None:
            break  # host jitter is seconds/scene; one warm batch is enough
    scenes = 0
    t0 = time.perf_counter()
    while scenes < min_scenes:
        for b in loader:
            scenes += b["images"].shape[0]
            b["images"][0, 0, 0, 0, 0]  # touch
            if scenes >= min_scenes:
                break
    return scenes / (time.perf_counter() - t0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dir", default="/tmp/vfa_loader_bench")
    p.add_argument("--data", default="MultiviewC",
                   choices=["MultiviewC", "MultiviewX", "Wildtrack"])
    p.add_argument("--frames", type=int, default=24)
    p.add_argument("--quality", type=int, default=90)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--threads", type=int, nargs="*", default=None,
                   help="thread counts to sweep (default: 1..2*cores)")
    p.add_argument("--target", type=float, default=72.0,
                   help="scenes/sec the device side sustains (bench.py)")
    p.add_argument("--jitter_only", action="store_true",
                   help="measure only the ColorJitter rows (skip the "
                        "decode/loader sweep already recorded in "
                        "IMPLEMENTATION.md)")
    args = p.parse_args()

    cfg = get_config(args.data)
    cams, size = cfg.num_cam, cfg.resize_size
    cores = len(os.sched_getaffinity(0))
    print(f"# {args.data}: {cams} cams x {size[0]}x{size[1]}, "
          f"{cores} host cores", file=sys.stderr)
    fpaths = ensure_dataset(os.path.join(args.dir, args.data), args.frames,
                            cams, size, args.quality)

    rates = {}
    for backend in () if args.jitter_only else ("pil", "native"):
        for dtype, tag in ((np.float32, ""), (np.uint8, "_u8")):
            r = bench_raw(fpaths, cams, args.frames, size, backend, dtype)
            rates[backend + tag] = r
            print(json.dumps({
                "metric": f"decode_{backend}{tag}_images_per_sec_per_core",
                "value": round(r, 1), "unit": "images/sec",
                "vs_baseline": round(r / (args.target * cams), 4),
            }))

    threads = args.threads or sorted({1, 2, max(1, cores // 2), cores,
                                      2 * cores})
    for backend in () if args.jitter_only else ("pil", "native"):
        ds = DiskFrames(cfg, fpaths, args.frames, backend)
        for dtype, tag in ((np.float32, ""), (np.uint8, "_u8")):
            for t in threads:
                r = bench_loader(ds, args.batch, t, dtype)
                print(json.dumps({
                    "metric": f"loader_{backend}{tag}_t{t}_scenes_per_sec",
                    "value": round(r, 2), "unit": "scenes/sec",
                    "vs_baseline": round(r / args.target, 4),
                }))

    # Train-split ColorJitter (the reference jitters every train image,
    # `/root/reference/train.py:209-214`): host numpy cost per scene, plus
    # the loader e2e WITH host jitter — the number that bounds from-disk
    # training throughput per core when jitter runs on the host. (The
    # shipping train path instead applies the jitter ON-DEVICE inside the
    # jitted staging step — vfa_tpu/data/augment.device_color_jitter — so
    # the host cost is only the decode; bench.py --train --from_disk
    # measures that overlapped path.)
    from vfa_tpu.data.augment import ColorJitterAugment

    aug = ColorJitterAugment()
    ds0 = DiskFrames(cfg, fpaths, args.frames, "native")
    scene = ds0.load_images(0)
    arng = np.random.default_rng(0)
    aug(scene, arng)  # warm
    n, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < 4.0:
        aug(scene, arng)
        n += 1
    jit_ms = (time.perf_counter() - t0) / n * 1e3
    print(json.dumps({
        "metric": "colorjitter_host_ms_per_scene",
        "value": round(jit_ms, 1), "unit": "ms/scene",
        # fraction of one core's real-time budget per scene at the target
        "vs_baseline": round(jit_ms / 1e3 * args.target, 4),
    }))
    # one short e2e row (host jitter is seconds/scene — a full sweep would
    # run for hours; the ms/scene row above already determines the verdict)
    ds_aug = DiskFrames(cfg, fpaths, args.frames, "native")
    t = threads[-1]
    r = bench_loader(ds_aug, args.batch, t, np.float32, augment=aug,
                     min_scenes=max(4, args.batch))
    print(json.dumps({
        "metric": f"loader_native_hostjitter_t{t}_scenes_per_sec",
        "value": round(r, 2), "unit": "scenes/sec",
        "vs_baseline": round(r / args.target, 4),
    }))

    if "native" in rates:
        need = args.target * cams / rates["native"]
        print(f"# feeding {args.target} scenes/sec needs ~{need:.0f} cores "
              f"at the native backend's per-core rate (TPU v5e VMs have "
              f"112/224)", file=sys.stderr)


if __name__ == "__main__":
    main()
