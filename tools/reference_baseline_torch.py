"""Torch-CPU baseline double of the reference hot path, for bench.py.

The reference (Hippogriff/prifit) publishes no throughput numbers and its
code cannot run here (hard-coded ``.cuda()`` calls, open3d/trimesh imports;
this machine has CPU torch only).  Per BASELINE.md, baseline values "must
be measured from the reference code itself" — this module is the closest
measurable stand-in: an independent torch implementation that preserves
the reference's *performance-relevant* structure:

  - PointNet++ MSG encoder with the serial farthest-point-sampling loop
    (``models/pointnet_util.py:63-84``) and full pairwise-distance ball
    queries;
  - per-shape Python loop over the batch for mean-shift clustering with
    a fixed number of Gaussian kernel iterations (``src/mean_shift.py``);
  - per-cluster Python-loop weighted SVD ellipsoid fits
    (``src/ellipsoid_fitting.py:74-117``);
  - primitive sampling + two-sided nearest-neighbor chamfer.

Numbers produced here are CPU numbers; they are a lower bound on the
reference's A100 throughput and an upper bound on nothing — bench.py
reports the ratio with the hardware clearly labeled.
"""

import json
import math
import time

import numpy as np
import torch
import torch.nn as nn


def square_distance(a, b):
    return torch.cdist(a, b) ** 2


def farthest_point_sample(xyz, npoint):
    B, N, _ = xyz.shape
    centroids = torch.zeros(B, npoint, dtype=torch.long)
    distance = torch.full((B, N), 1e10)
    farthest = torch.randint(0, N, (B,))
    batch = torch.arange(B)
    for i in range(npoint):  # serial loop, as in the reference
        centroids[:, i] = farthest
        centroid = xyz[batch, farthest, :].view(B, 1, 3)
        d = torch.sum((xyz - centroid) ** 2, -1)
        distance = torch.minimum(distance, d)
        farthest = torch.max(distance, -1)[1]
    return centroids


def ball_group(radius, k, xyz, new_xyz):
    d = square_distance(new_xyz, xyz)
    N = xyz.shape[1]
    idx = torch.arange(N).view(1, 1, N).expand_as(d).clone()
    idx[d > radius ** 2] = N
    idx = idx.sort(dim=-1)[0][:, :, :k]
    first = idx[:, :, :1].expand_as(idx)
    idx = torch.where(idx == N, first, idx).clamp(max=N - 1)
    return idx


def gather(points, idx):
    B = points.shape[0]
    flat = idx.reshape(B, -1)
    out = torch.gather(points, 1, flat.unsqueeze(-1).expand(
        -1, -1, points.shape[-1]))
    return out.view(*idx.shape, points.shape[-1])


class MsgLayer(nn.Module):
    def __init__(self, npoint, radii, ks, in_ch, mlps):
        super().__init__()
        self.npoint, self.radii, self.ks = npoint, radii, ks
        self.blocks = nn.ModuleList()
        for mlp in mlps:
            seq, last = [], in_ch + 3
            for f in mlp:
                seq += [nn.Conv2d(last, f, 1), nn.BatchNorm2d(f),
                        nn.ReLU()]
                last = f
            self.blocks.append(nn.Sequential(*seq))

    def forward(self, xyz, feats):
        idx = farthest_point_sample(xyz, self.npoint)
        new_xyz = torch.gather(xyz, 1, idx.unsqueeze(-1).expand(-1, -1, 3))
        outs = []
        for r, k, block in zip(self.radii, self.ks, self.blocks):
            gi = ball_group(r, k, xyz, new_xyz)
            g_xyz = gather(xyz, gi) - new_xyz.unsqueeze(2)
            g = torch.cat([gather(feats, gi), g_xyz], -1) \
                if feats is not None else g_xyz
            g = block(g.permute(0, 3, 2, 1))
            outs.append(torch.max(g, 2)[0])
        return new_xyz, torch.cat(outs, 1).permute(0, 2, 1)


class MsgEncoder(nn.Module):
    """Perf-equivalent MSG backbone + 128-d per-point head."""

    def __init__(self):
        super().__init__()
        self.sa1 = MsgLayer(512, [0.1, 0.2, 0.4], [32, 64, 128], 3,
                            [[32, 32, 64], [64, 64, 128], [64, 96, 128]])
        self.sa2 = MsgLayer(128, [0.4, 0.8], [64, 128], 320,
                            [[128, 128, 256], [128, 196, 256]])
        self.global_mlp = nn.Sequential(
            nn.Conv1d(515, 256, 1), nn.BatchNorm1d(256), nn.ReLU(),
            nn.Conv1d(256, 512, 1), nn.BatchNorm1d(512), nn.ReLU(),
            nn.Conv1d(512, 1024, 1), nn.BatchNorm1d(1024), nn.ReLU())
        self.head = nn.Sequential(
            nn.Conv1d(1024 + 512, 256, 1), nn.BatchNorm1d(256), nn.ReLU(),
            nn.Conv1d(256, 128, 1), nn.BatchNorm1d(128), nn.ReLU())

    def forward(self, xyz):
        l1_xyz, l1 = self.sa1(xyz, xyz)
        l2_xyz, l2 = self.sa2(l1_xyz, l1)
        g = self.global_mlp(torch.cat([l2, l2_xyz], -1).permute(0, 2, 1))
        g = torch.max(g, 2, keepdim=True)[0]
        # 3-NN interpolation of l2 features back to N (perf-equivalent FP)
        d = square_distance(xyz, l2_xyz)
        dd, idx = d.topk(3, largest=False)
        w = 1.0 / (dd + 1e-8)
        w = w / w.sum(-1, keepdim=True)
        up = (gather(l2, idx) * w.unsqueeze(-1)).sum(2)        # [B, N, 512]
        x = torch.cat([g.expand(-1, -1, xyz.shape[1]),
                       up.permute(0, 2, 1)], 1)
        return self.head(x).permute(0, 2, 1)                    # [B, N, 128]


def mean_shift(X, quantile, iterations):
    N = X.shape[0]
    K = max(int(quantile * N), 1)
    d = 2.0 - 2.0 * X @ X.T
    kth = d.topk(K, largest=False)[0][:, -1]
    bw = torch.sqrt(torch.clamp(kth, min=1e-6)).mean()
    new_X = X
    for _ in range(iterations):
        k = torch.exp(-(2.0 - 2.0 * new_X @ X.T) / (bw ** 2) / 2.0)
        new_X = (k @ X) / k.sum(1, keepdim=True)
        new_X = new_X / new_X.norm(dim=1, keepdim=True)
    return new_X, bw


def fit_ellipsoids(points, weights):
    """Per-cluster Python loop, weighted covariance + SVD (reference
    structure)."""
    params = []
    for i in range(weights.shape[1]):
        w = weights[:, i:i + 1]
        sw = w.sum().clamp(min=1e-6)
        center = (points * w).sum(0) / sw
        c = points - center
        cov = (c * w).T @ c / sw
        U, S, V = torch.svd(cov + 1e-6 * torch.eye(3))
        if S[0] / S[2].clamp(min=1e-30) > 1e5:
            continue
        t = (c * w) @ V
        r = (t.max(0)[0] - t.min(0)[0]) / 2.0
        params.append((r, V, center))
    return params


def fibonacci_sphere(n):
    g = (1 + math.sqrt(5)) / 2
    i = torch.arange(n, dtype=torch.float32)
    z = 1 - (2 * i + 1) / n
    th = 2 * math.pi * i / g
    rho = torch.sqrt(torch.clamp(1 - z * z, min=0))
    return torch.stack([rho * torch.cos(th), rho * torch.sin(th), z], 1)


def full_pipeline(model, points, quantile=0.05, iterations=10,
                  max_clusters=25, n_samples=256):
    """fwd + cluster + fit + sample + chamfer for one batch (B, 2048, 3)."""
    emb = model(points)
    emb = torch.nn.functional.normalize(emb, dim=2)
    dirs = fibonacci_sphere(n_samples)
    losses = []
    for b in range(points.shape[0]):  # per-shape loop (reference structure)
        modes, bw = mean_shift(emb[b], quantile, iterations)
        sim = modes @ emb[b].T
        centers = modes[:max_clusters]               # fixed-cap stand-in
        w = torch.softmax((centers @ emb[b].T) / bw ** 2, dim=0).T
        params = fit_ellipsoids(points[b], w)
        if not params:
            continue
        samples = torch.cat([
            (dirs * r) @ V.T + center for r, V, center in params])
        d = square_distance(samples.unsqueeze(0),
                            points[b].unsqueeze(0))[0]
        losses.append(d.min(1)[0].mean() + d.min(0)[0].mean())
    return torch.stack(losses).mean() if losses else torch.zeros(())


def measure(batch=24, npoint=2048, warmup=1, reps=2) -> dict:
    torch.manual_seed(0)
    torch.set_num_threads(max(torch.get_num_threads(), 8))
    model = MsgEncoder().eval()
    pts = torch.randn(batch, npoint, 3)
    with torch.no_grad():
        for _ in range(warmup):
            full_pipeline(model, pts[:2])           # cheap warmup
        t0 = time.time()
        for _ in range(reps):
            full_pipeline(model, pts)
        dt = (time.time() - t0) / reps
    return {
        "clouds_per_sec": batch / dt,
        "seconds_per_batch": dt,
        "batch": batch,
        "npoint": npoint,
        "hardware": "cpu-torch",
        "threads": torch.get_num_threads(),
    }


if __name__ == "__main__":
    result = measure()
    print(json.dumps(result))
    with open("BASELINE_MEASURED.json", "w") as f:
        json.dump(result, f, indent=1)
