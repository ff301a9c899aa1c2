#!/usr/bin/env python
"""Terrain asset tool: import custom heightmaps into heligym_tpu npz assets.

The functional equivalent of the reference's offline heightmap preprocessor
(/root/reference/heligym/envs/renderer/resources/models/terrain/hmap.py) and
of its "make terrain heightmap input generic" goal (README.md TODO): take any
grayscale heightmap image (PNG/…, 8- or 16-bit), optionally box-smooth it,
and write a `terrain.npz` the framework loads directly. Normals are derived
from the heightmap if no normal image is given.

Usage:
    python tools/terrain_tool.py import my_map.png --out heligym_tpu/assets/my_terrain.npz \
        [--smooth 5] [--normal my_normals.png]
    python tools/terrain_tool.py info heligym_tpu/assets/terrain.npz
"""
import argparse

import numpy as np


def box_smooth(img: np.ndarray, k: int) -> np.ndarray:
    """k x k box filter with edge clamping (the reference uses cv2.blur's
    default border behavior; clamping matches it closely)."""
    if k <= 1:
        return img
    pad = k // 2
    padded = np.pad(img.astype(np.float64), pad, mode="edge")
    out = np.zeros_like(img, dtype=np.float64)
    for dy in range(k):
        for dx in range(k):
            out += padded[dy:dy + img.shape[0], dx:dx + img.shape[1]]
    return out / (k * k)


def normals_from_hmap(h01: np.ndarray, max_alt_ft: float, ns_ft: float,
                      ew_ft: float) -> np.ndarray:
    """Unit surface normals from central differences of the heightmap."""
    h = h01 * max_alt_ft
    gy, gx = np.gradient(h, ew_ft / h01.shape[0], ns_ft / h01.shape[1])
    n = np.stack([-gx, -gy, np.ones_like(h)], axis=-1)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    # store in [0,1] image convention like the reference normal map
    return ((n + 1.0) * 0.5)


def cmd_import(args):
    import imageio.v2 as imageio
    img = imageio.imread(args.image)
    if img.ndim == 3:
        img = img[..., 0]
    if args.smooth > 1:
        img = box_smooth(img, args.smooth)
    info_max = np.iinfo(np.uint16).max
    h01 = np.asarray(img, np.float64)
    h01 = h01 / h01.max() if h01.max() > 0 else h01
    hmap_raw = (h01 * info_max).astype(np.uint16)

    if args.normal:
        nmap_raw = imageio.imread(args.normal)[..., :3].astype(np.uint8)
    else:
        nmap = normals_from_hmap(h01, args.max_alt, args.ns_span, args.ew_span)
        nmap_raw = (nmap * 255).astype(np.uint8)

    np.savez_compressed(args.out, hmap_raw=hmap_raw, nmap_raw=nmap_raw,
                        attribution=np.array(args.attribution))
    print(f"wrote {args.out}: hmap {hmap_raw.shape} uint16, "
          f"nmap {nmap_raw.shape} uint8")
    print("Point the model YAML's ENV.HMAP_PATH at this file (and set "
          "MAX_GR_ALT / NS_MAX / EW_MAX to the physical extents).")


def cmd_info(args):
    with np.load(args.asset) as z:
        for k in z.files:
            v = z[k]
            print(f"{k}: shape={getattr(v, 'shape', None)} dtype={getattr(v, 'dtype', None)}")
            if k == "attribution":
                print("  ", str(v))


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    imp = sub.add_parser("import")
    imp.add_argument("image")
    imp.add_argument("--out", required=True)
    imp.add_argument("--smooth", type=int, default=1)
    imp.add_argument("--normal", default=None)
    imp.add_argument("--max-alt", type=float, default=8809.0551,
                     help="[ft] altitude encoded by full-scale pixels")
    imp.add_argument("--ns-span", type=float, default=6561.6798)
    imp.add_argument("--ew-span", type=float, default=6561.6798)
    imp.add_argument("--attribution", default="user-provided terrain")
    imp.set_defaults(fn=cmd_import)
    inf = sub.add_parser("info")
    inf.add_argument("asset")
    inf.set_defaults(fn=cmd_info)
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
