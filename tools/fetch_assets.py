"""Fetches the fruit-fly visual meshes into the vendored asset tree.

The framework vendors every walker XML plus the small rodent/stick assets
(track_mjx_tpu/envs/walker/assets/, ~2 MB). The fly's 79 visual .obj meshes
(~59 MB) are not committed; they are resolved in priority order:

1. already present in the vendored tree (this script's output);
2. a full asset checkout pointed to by TRACK_MJX_TPU_ASSETS;
3. generated placeholder meshes (envs/walker/fly.ensure_fly_assets) — the
   fly's collision geoms are primitives, so physics vs. the same compiled
   model is unaffected; only visuals and the meshes' small inertia
   contribution differ from the canonical model.

This script downloads the canonical meshes (flybody, the upstream source of
the reference's fly model: github.com/TuragaLab/flybody) and verifies each
against the committed sha256 manifest
(envs/walker/assets/fruitfly/mesh_manifest.json) before installing. Files
failing verification are discarded.

Usage: python tools/fetch_assets.py [--base-url URL] [--dest DIR]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import sys
import urllib.request
from pathlib import Path

_PKG_ASSETS = (
    Path(__file__).resolve().parent.parent
    / "track_mjx_tpu"
    / "envs"
    / "walker"
    / "assets"
    / "fruitfly"
)
_DEFAULT_BASE = (
    "https://raw.githubusercontent.com/TuragaLab/flybody/main/"
    "flybody/fruitfly/assets"
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-url", default=_DEFAULT_BASE)
    ap.add_argument("--dest", default=str(_PKG_ASSETS / "assets"))
    ap.add_argument("--manifest", default=str(_PKG_ASSETS / "mesh_manifest.json"))
    args = ap.parse_args()

    with open(args.manifest) as f:
        manifest = json.load(f)
    dest = Path(args.dest)
    dest.mkdir(parents=True, exist_ok=True)

    ok = failed = skipped = 0
    for name, meta in manifest.items():
        out = dest / name
        if out.exists():
            digest = hashlib.sha256(out.read_bytes()).hexdigest()
            if digest == meta["sha256"]:
                skipped += 1
                continue
        url = f"{args.base_url}/{name}"
        try:
            blob = urllib.request.urlopen(url, timeout=60).read()
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"FETCH FAILED {name}: {e}", file=sys.stderr)
            failed += 1
            continue
        digest = hashlib.sha256(blob).hexdigest()
        if digest != meta["sha256"]:
            print(
                f"CHECKSUM MISMATCH {name}: got {digest[:12]}.., "
                f"want {meta['sha256'][:12]}.. — discarded",
                file=sys.stderr,
            )
            failed += 1
            continue
        out.write_bytes(blob)
        ok += 1
    print(f"fetched={ok} cached={skipped} failed={failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
