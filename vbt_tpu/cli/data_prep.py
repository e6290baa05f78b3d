"""Partition LabelStudio exports into train/test/valid directories.

Behaviour-compatible with the reference data_prep.py (data_prep.py:13-51):
85/5/10 split after a random shuffle; the valid partition is taken from the
tail of the shuffled list (so train and valid can overlap when the
percentages sum past 1.0, exactly like the reference's ``files[-num_valid:]``
indexing). Files are copied as jpg+xml pairs.
"""

from __future__ import annotations

import glob
import os
import shutil

import click
import numpy as np

TRAIN_PERCENTAGE = 0.85
TEST_PERCENTAGE = 0.05
VALID_PERCENTAGE = 0.1


def split_files(files: list[str], rng: np.random.Generator) -> dict[str, list[str]]:
    files = list(files)
    rng.shuffle(files)
    num_train = round(len(files) * TRAIN_PERCENTAGE)
    num_test = round(len(files) * TEST_PERCENTAGE)
    num_valid = round(len(files) * VALID_PERCENTAGE)
    return {
        "train": files[0:num_train],
        "test": files[num_train : num_train + num_test],
        "valid": files[-num_valid:] if num_valid else [],
    }


def copy_pairs(stems, annotations_dir, images_dir, dest_dir, partition):
    os.makedirs(os.path.join(dest_dir, partition), exist_ok=True)
    for stem in stems:
        for ext, src_dir in ((".xml", annotations_dir), (".jpg", images_dir)):
            src = os.path.join(src_dir, stem + ext)
            dst = os.path.join(dest_dir, partition, stem + ext)
            shutil.copy(src, dst)


@click.command()
@click.option("--annotations_dir", default="tmp/project3/Annotations", show_default=True)
@click.option("--images_dir", default="tmp/project3/images", show_default=True)
@click.option("--dest_dir", default="data", show_default=True)
@click.option("--seed", default=None, type=int, help="Shuffle seed (reference uses none).")
def main(annotations_dir, images_dir, dest_dir, seed):
    """Split a LabelStudio export into train/test/valid VOC directories."""
    files = [
        os.path.basename(p)[:-4]
        for p in glob.glob(os.path.join(annotations_dir, "*"))
    ]
    rng = np.random.default_rng(seed)
    parts = split_files(files, rng)
    for partition, stems in parts.items():
        copy_pairs(stems, annotations_dir, images_dir, dest_dir, partition)
        print(f"{partition}: {len(stems)} pairs")


if __name__ == "__main__":
    main()
