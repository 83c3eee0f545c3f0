"""ModelNet40 loader (external-fixture seam).

The reference imports ``data_utils.ModelNetDataLoader`` for its optional
``--modelnet_val`` SVM probe but never ships it (SURVEY.md §2.9.3) — the
import is a latent crash.  This implements the loader the import refers
to: the standard ``modelnet40_normal_resampled`` layout used by the
PointNet++ codebase family the reference descends from:

    ROOT/modelnet40_shape_names.txt       one class name per line
    ROOT/modelnet40_{train,test}.txt      shape ids, e.g. airplane_0001
    ROOT/<class>/<shape_id>.txt           csv rows: x,y,z,nx,ny,nz
"""

import os.path as osp

import numpy as np

from prifit_tpu.native import fast_loadtxt

from prifit_tpu.data.shapenet import pc_normalize


class ModelNetDataLoader:
    def __init__(self, root, npoint=1024, split="train",
                 normal_channel=True, uniform=False,
                 rng: np.random.Generator | None = None):
        self.root = root
        self.npoints = npoint
        self.normal_channel = normal_channel
        self.uniform = uniform
        self.rng = rng if rng is not None else np.random.default_rng()

        with open(osp.join(root, "modelnet40_shape_names.txt")) as f:
            self.cat = [l.strip() for l in f if l.strip()]
        self.classes = dict(zip(self.cat, range(len(self.cat))))

        with open(osp.join(root, f"modelnet40_{split}.txt")) as f:
            shape_ids = [l.strip() for l in f if l.strip()]
        # class name = shape id minus trailing _NNNN
        names = ["_".join(s.split("_")[0:-1]) for s in shape_ids]
        self.datapath = [
            (names[i], osp.join(root, names[i], shape_ids[i] + ".txt"))
            for i in range(len(shape_ids))]
        self.cache = {}

    def __len__(self):
        return len(self.datapath)

    def __getitem__(self, index):
        if index in self.cache:
            point_set, cls = self.cache[index]
        else:
            cat, fn = self.datapath[index]
            cls = np.array([self.classes[cat]], dtype=np.int32)
            point_set = fast_loadtxt(fn).astype(np.float32)
            self.cache[index] = (point_set, cls)
        if self.uniform:
            # deterministic FPS is overkill for a probe; stride-sample
            idx = np.linspace(0, point_set.shape[0] - 1, self.npoints,
                              dtype=np.int64)
            pts = point_set[idx].copy()
        else:
            pts = point_set[: self.npoints].copy()
        pts[:, 0:3] = pc_normalize(pts[:, 0:3])
        if not self.normal_channel:
            pts = pts[:, 0:3]
        return pts, cls
