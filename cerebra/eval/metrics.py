"""Metric utilities beyond retrieval: top-k accuracy, PCA+whitening,
Oxford-style mAP, multi-scale inference (utils/utils.py:506-513, 658-833)."""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def accuracy(output: jax.Array, target: jax.Array, topk: Sequence[int] = (1,)) -> List[float]:
    """Top-k accuracy over logits (utils/utils.py:506-513)."""
    maxk = max(topk)
    _, pred = jax.lax.top_k(output, maxk)  # (B, maxk)
    correct = pred == target[:, None]
    B = target.shape[0]
    return [float(jnp.sum(correct[:, :k]) * 100.0 / B) for k in topk]


class PCA:
    """PCA with power-whitening (utils/utils.py:658-709): eigendecompose a
    covariance, keep top-dim components, scale by 1/λ^whit."""

    def __init__(self, dim: int = 256, whit: float = 0.5):
        self.dim = dim
        self.whit = whit
        self.mean: Optional[np.ndarray] = None
        self.dvt: Optional[np.ndarray] = None

    def train_pca(self, cov: np.ndarray) -> None:
        d, v = np.linalg.eigh(np.asarray(cov, dtype=np.float64))
        eps = d.max() * 1e-5
        d = np.where(d < eps, eps, d)
        idx = np.argsort(d)[::-1][: self.dim]
        d, v = d[idx], v[:, idx]
        self.dvt = np.diag(1.0 / d**self.whit) @ v.T

    def fit(self, x: np.ndarray) -> "PCA":
        x = np.asarray(x, dtype=np.float64)
        self.mean = x.mean(axis=0)
        self.train_pca(np.cov(x - self.mean, rowvar=False))
        return self

    def apply(self, x) -> np.ndarray:
        x = np.asarray(x, dtype=np.float64)
        if self.mean is not None:
            x = x - self.mean
        return (self.dvt @ x.T).T


def compute_ap(ranks: np.ndarray, nres: int) -> float:
    """Average precision from zero-based positive ranks (utils/utils.py:712-745)."""
    ap = 0.0
    recall_step = 1.0 / nres
    for j, rank in enumerate(np.asarray(ranks)):
        precision_0 = 1.0 if rank == 0 else float(j) / rank
        precision_1 = float(j + 1) / (rank + 1)
        ap += (precision_0 + precision_1) * recall_step / 2.0
    return ap


def compute_map(
    ranks: np.ndarray, gnd: List[dict], kappas: Sequence[int] = ()
) -> Tuple[float, np.ndarray, np.ndarray, np.ndarray]:
    """Oxford/Paris-style mAP with ok/junk sets (utils/utils.py:748-816).
    ranks: (db_size, n_queries) zero-based."""
    nq = len(gnd)
    aps = np.zeros(nq)
    pr = np.zeros(len(kappas))
    prs = np.zeros((nq, len(kappas)))
    nempty = 0
    map_ = 0.0
    for i in range(nq):
        qgnd = np.array(gnd[i]["ok"])
        if qgnd.shape[0] == 0:
            aps[i] = float("nan")
            prs[i, :] = float("nan")
            nempty += 1
            continue
        qgndj = np.array(gnd[i].get("junk", []))
        pos = np.arange(ranks.shape[0])[np.isin(ranks[:, i], qgnd)]
        junk = np.arange(ranks.shape[0])[np.isin(ranks[:, i], qgndj)]
        k = 0
        ij = 0
        if len(junk):
            ip = 0
            while ip < len(pos):
                while ij < len(junk) and pos[ip] > junk[ij]:
                    k += 1
                    ij += 1
                pos[ip] -= k
                ip += 1
        ap = compute_ap(pos, len(qgnd))
        map_ += ap
        aps[i] = ap
        # precision@k over 1-BASED positions (utils/utils.py:807-810: pos += 1
        # before kq = min(max(pos), kappa) and the <= comparison)
        pos1 = pos + 1
        for j, kappa in enumerate(kappas):
            kq = min(max(pos1), kappa)
            prs[i, j] = (pos1 <= kq).sum() / kq if kq > 0 else 0.0
        pr = pr + prs[i, :]
    denom = max(nq - nempty, 1)
    return map_ / denom, aps, pr / denom, prs


def multi_scale(samples: jax.Array, model_fn) -> jax.Array:
    """3-scale feature averaging (utils/utils.py:819-833): scales 1, 1/√2,
    1/2; features summed, /3, L2-normalized. samples: NHWC images."""
    v = None
    B, H, W, C = samples.shape
    for s in (1.0, 1 / 2 ** 0.5, 0.5):
        if s == 1.0:
            inp = samples
        else:
            # torch F.interpolate(scale_factor=s, align_corners=False)
            # parity needs BOTH: no antialiasing on downsample (jax default
            # antialiases) and sampling by the LITERAL float scale s, not
            # the out/in integer-size ratio. In pixel-CENTER coordinates the
            # half-pixel mapping src=(dst+0.5)/s−0.5 is a pure scale, so
            # scale_and_translate with scale=s, translation=0 is exact
            # (verified bit-close against torch at 16→11)
            out_hw = (int(H * s), int(W * s))
            inp = jax.image.scale_and_translate(
                samples, (B, *out_hw, C), (1, 2),
                jnp.asarray([s, s], samples.dtype),
                jnp.zeros((2,), samples.dtype),
                method="bilinear", antialias=False,
            )
        feats = model_fn(inp)
        v = feats if v is None else v + feats
    v = v / 3.0
    return v / jnp.linalg.norm(v)
