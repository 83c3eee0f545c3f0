"""Tiny on-the-fly dataset fixtures (SURVEY.md §4 implied fixtures).

The loaders only need ``synsetoffset2category.txt``, the three split
jsons, and per-synset ``.txt`` point files
(``ShapeNetDataLoader.py:29-52``) — and ``.npy`` folders for the ACD
variants (``:302-327``).
"""

import json
import os
import os.path as osp

import numpy as np

CATEGORIES = {"Airplane": "02691156", "Chair": "03001627",
              "Lamp": "03636649"}
# first global part label per fixture category (subset of SEG_CLASSES)
PART_OFFSET = {"Airplane": 0, "Chair": 12, "Lamp": 24}


def make_shapenet_fixture(root, n_per_cat=6, n_points=64,
                          categories=None, normals=True, seed=0):
    """Build a minimal ShapeNet-Part directory tree under ``root``.

    Each shape is a random blob; seg labels are valid global part ids for
    its category.  Splits: first ~1/2 train, next ~1/4 val, rest test.
    """
    rng = np.random.default_rng(seed)
    cats = categories or CATEGORIES
    os.makedirs(osp.join(root, "train_test_split"), exist_ok=True)
    with open(osp.join(root, "synsetoffset2category.txt"), "w") as f:
        for name, synset in cats.items():
            f.write(f"{name}\t{synset}\n")

    splits = {"train": [], "val": [], "test": []}
    for name, synset in cats.items():
        d = osp.join(root, synset)
        os.makedirs(d, exist_ok=True)
        for i in range(n_per_cat):
            token = f"{name.lower()}{i:04d}"
            pts = rng.normal(size=(n_points, 3)).astype(np.float32)
            nrm = rng.normal(size=(n_points, 3)).astype(np.float32)
            nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
            off = PART_OFFSET.get(name, 0)
            seg = rng.integers(off, off + 3, n_points).astype(np.float32)
            cols = [pts, nrm] if normals else [pts]
            data = np.concatenate(cols + [seg[:, None]], axis=1)
            np.savetxt(osp.join(d, token + ".txt"), data, fmt="%.6f")
            if i < n_per_cat // 2:
                split = "train"
            elif i < 3 * n_per_cat // 4:
                split = "val"
            else:
                split = "test"
            splits[split].append(f"shape_data/{synset}/{token}")

    for split, ids in splits.items():
        with open(osp.join(root, "train_test_split",
                           f"shuffled_{split}_file_list.json"), "w") as f:
            json.dump(ids, f)
    return root


def make_modelnet_fixture(root, n_classes=4, n_per_class=6, n_points=128,
                          seed=0):
    """Build a minimal ``modelnet40_normal_resampled`` tree under root."""
    rng = np.random.default_rng(seed)
    classes = [f"class{i:02d}" for i in range(n_classes)]
    os.makedirs(root, exist_ok=True)
    with open(osp.join(root, "modelnet40_shape_names.txt"), "w") as f:
        f.write("\n".join(classes) + "\n")
    splits = {"train": [], "test": []}
    for ci, name in enumerate(classes):
        d = osp.join(root, name)
        os.makedirs(d, exist_ok=True)
        for i in range(n_per_class):
            sid = f"{name}_{i:04d}"
            # class-dependent anisotropy (survives unit-sphere
            # normalization) so a probe can actually separate
            scale = np.array([1.0, 0.6 ** ci, 0.3 ** ci])
            pts = rng.normal(size=(n_points, 3)) * scale
            nrm = rng.normal(size=(n_points, 3))
            nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
            data = np.concatenate([pts, nrm], axis=1).astype(np.float32)
            np.savetxt(osp.join(d, sid + ".txt"), data, delimiter=",",
                       fmt="%.6f")
            splits["train" if i < 2 * n_per_class // 3 else "test"].append(
                sid)
    for split, ids in splits.items():
        with open(osp.join(root, f"modelnet40_{split}.txt"), "w") as f:
            f.write("\n".join(ids) + "\n")
    return root


def make_acd_fixture(root, n_shapes=8, n_points=200, n_components=4,
                     subfolder="shapes", seed=0):
    """Build a minimal ACD ``.npy`` directory under ``root``.

    Each ``.npy`` is ``[n_points, 4]``: xyz + ACD component id in the last
    column (``ShapeNetDataLoader.py:302-327`` layout).
    """
    rng = np.random.default_rng(seed)
    d = osp.join(root, subfolder)
    os.makedirs(d, exist_ok=True)
    for i in range(n_shapes):
        # clustered blobs so ACD components are geometrically meaningful
        centers = rng.normal(scale=2.0, size=(n_components, 3))
        comp = rng.integers(0, n_components, n_points)
        pts = centers[comp] + 0.3 * rng.normal(size=(n_points, 3))
        data = np.concatenate(
            [pts.astype(np.float32), comp[:, None].astype(np.float32)], 1)
        np.save(osp.join(d, f"acd{i:04d}.npy"), data)
    return root


def make_s3dis_fixture(root, n_rooms=4, n_points=5000, seed=0):
    """Build minimal S3DIS-format ``Area_<i>_<room>.npy`` files."""
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    for i in range(n_rooms):
        area = 5 if i == n_rooms - 1 else (i % 4) + 1
        xyz = rng.uniform(0, 3, (n_points, 3))
        rgb = rng.uniform(0, 255, (n_points, 3))
        label = rng.integers(0, 13, (n_points, 1))
        data = np.concatenate([xyz, rgb, label], 1).astype(np.float32)
        np.save(osp.join(root, f"Area_{area}_room{i}.npy"), data)
    return root
