import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Build the held-out evaluation split (VERDICT r3 item 6).

The reference ships exactly ONE validation image (kodim21), so every R-D
claim so far rests on a single image. This script deterministically splits
the reference's 19k imagenet_patches into:

- ``data/train_patches/``    — symlinks to 18,488 patches (round-4+ training
                               set; excludes every held-out patch)
- ``data/heldout_patches/``  — symlinks to 512 patches never trained on
                               (round-4+ models), a patch-statistics eval set
- ``data/val_mosaics/``      — 8 PNGs, each 1024x1024 = an 8x8 grid of 64
                               held-out patches. Large never-seen images with
                               Kodak-scale dimensions: the hyper-side
                               generalization probe (RESULTS.md §7.2 showed
                               hyper/joint contexts overfit 128x128 patch
                               statistics and pay on 768x512 images).

Deterministic by construction (seed 20260821, sorted filenames), so the
split is reproducible from the reference data alone and the generated
dirs stay out of git.
"""
import numpy as np
from PIL import Image

SRC = "/root/reference/data/imagenet_patches"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, "data")
SEED = 20260821
N_HELDOUT = 512
GRID = 8  # 8x8 patches per mosaic -> 1024x1024; 8 mosaics use all 512


def _fresh_symlink_dir(path: str, names: list[str]) -> None:
    os.makedirs(path, exist_ok=True)
    for f in os.listdir(path):
        os.unlink(os.path.join(path, f))
    for n in names:
        os.symlink(os.path.join(SRC, n), os.path.join(path, n))


def main() -> None:
    names = sorted(
        n for n in os.listdir(SRC) if n.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    rng = np.random.default_rng(SEED)
    held_idx = rng.choice(len(names), size=N_HELDOUT, replace=False)
    held = sorted(names[i] for i in held_idx)
    held_set = set(held)
    train = [n for n in names if n not in held_set]

    _fresh_symlink_dir(os.path.join(DATA, "heldout_patches"), held)
    _fresh_symlink_dir(os.path.join(DATA, "train_patches"), train)

    mosaic_dir = os.path.join(DATA, "val_mosaics")
    os.makedirs(mosaic_dir, exist_ok=True)
    per = GRID * GRID
    for m in range(N_HELDOUT // per):
        tiles = []
        for r in range(GRID):
            row = []
            for c in range(GRID):
                p = Image.open(os.path.join(SRC, held[m * per + r * GRID + c]))
                row.append(np.asarray(p.convert("RGB"), np.uint8))
            tiles.append(np.concatenate(row, axis=1))
        mosaic = np.concatenate(tiles, axis=0)
        out = os.path.join(mosaic_dir, f"mosaic{m:02d}.png")
        Image.fromarray(mosaic).save(out, optimize=False)
        print(out, mosaic.shape)
    print(f"train={len(train)} heldout={len(held)} mosaics={N_HELDOUT // per}")


if __name__ == "__main__":
    main()
