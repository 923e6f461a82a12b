"""Generate a synthetic corpus (annotations + slide images) for end-to-end
smoke runs without TCGA/CPTAC data.

Usage:
    python annotations/make_synthetic.py --out /tmp/corpus --n_train 24 --n_val 10

Produces:
    {out}/annotations/tcga.csv, cptac.csv   (reference schema)
    {out}/slides/train/*.png, slides/val/*.png
Class signal: LUAD slides have eosin-pink-shifted tissue, LUSC
hematoxylin-blue-shifted — learnable by a small model in one epoch.
"""

from __future__ import annotations

import os

import click
import numpy as np
import pandas as pd


def make_wsi(path: str, label: int, seed: int, size: int = 512) -> None:
    from PIL import Image

    rng = np.random.default_rng(seed)
    img = np.full((size, size, 3), 245, np.uint8)
    yy, xx = np.mgrid[0:size, 0:size]
    for _ in range(size // 12):
        cy, cx = rng.integers(30, size - 30, 2)
        r = rng.integers(18, size // 6)
        m = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
        base = [200, 110, 140] if label == 0 else [115, 105, 195]
        img[m] = np.clip(
            base + rng.normal(0, 22, (int(m.sum()), 3)), 0, 255
        ).astype(np.uint8)
    Image.fromarray(img).save(path)


@click.command()
@click.option("--out", default="synthetic_corpus")
@click.option("--n_train", default=24)
@click.option("--n_val", default=10)
@click.option("--size", default=512, help="Slide image size in pixels.")
@click.option("--seed", default=0)
def main(out, n_train, n_val, size, seed):
    os.makedirs(f"{out}/annotations", exist_ok=True)
    os.makedirs(f"{out}/slides/train", exist_ok=True)
    os.makedirs(f"{out}/slides/val", exist_ok=True)

    rows = []
    for i in range(n_train):
        label = i % 2
        slide = f"SYN-TR-{i:04d}"
        make_wsi(f"{out}/slides/train/{slide}.png", label, seed + i, size)
        rows.append(
            dict(
                patient=f"TCGA-{i // 2:02d}-{1000 + i}",
                slide=slide,
                cohort="LUAD" if label == 0 else "LUSC",
                order=str(i),
                order2=str(n_train - i),
                site=f"{i % max(2, n_train // 6):02d}",
                gan="0",
            )
        )
    pd.DataFrame(rows).to_csv(f"{out}/annotations/tcga.csv", index=False)

    rows = []
    for i in range(n_val):
        label = i % 2
        slide = f"SYN-VA-{i:04d}"
        make_wsi(f"{out}/slides/val/{slide}.png", label, seed + 10_000 + i,
                 size)
        rows.append(
            dict(
                patient=f"CPT-{i:04d}",
                slide=slide,
                cohort="LUAD" if label == 0 else "LUSC",
            )
        )
    pd.DataFrame(rows).to_csv(f"{out}/annotations/cptac.csv", index=False)
    click.echo(f"Synthetic corpus at {out}: {n_train} train / {n_val} val slides")


if __name__ == "__main__":
    main()
