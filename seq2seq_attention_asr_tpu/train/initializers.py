"""Weight initialization: Gaussian reset + QR orthogonalization.

Reference: exp configs call `autoencoder:reset(init_std)` then
`TrainUtils.orthogonalizeGraph` (exp0_scriptchecker.lua:48-52,
exp_logmel7:38-39 via opt.orthogonalize). The orthogonalizer
(TrainUtils.lua:5-26) QR-decomposes each module's weight matrix with
the bias appended as an extra column (in Torch's (out, in) layout),
transposing first when rows < cols so the orthonormal side matches.

Here: weights are stored (..., fan_in, out); we orthogonalize the
(out, fan_in[+1]) matrix and scatter back. Fused cell kernels are
orthogonalized per logical sub-matrix (per gate) to match the
reference's per-nn.Linear granularity.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_reset(key, params, std: float):
    """theta ~ N(0, std^2) for every float leaf (torch :reset(std))."""
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(key, len(leaves))
    new = [
        jax.random.normal(k, l.shape, l.dtype) * std
        if jnp.issubdtype(l.dtype, jnp.floating)
        else l
        for k, l in zip(keys, leaves)
    ]
    return jax.tree.unflatten(treedef, new)


def _orthogonalize_matrix(w: np.ndarray, b: Optional[np.ndarray] = None):
    """w: (fan_in, out), b: (out,) or None. Returns orthogonalized (w, b).

    Mirrors TrainUtils.orthogonalize on the Torch-layout matrix
    A = [w^T | b] of shape (out, fan_in(+1)): qr(A) when out >= cols
    else qr(A^T)^T, then split back.
    """
    a = w.T  # (out, fan_in)
    if b is not None:
        a = np.concatenate([a, b[:, None]], axis=1)
    if a.shape[0] < a.shape[1]:
        q, _ = np.linalg.qr(a.T)
        q = q.T
    else:
        q, _ = np.linalg.qr(a)
    if b is not None:
        return np.ascontiguousarray(q[:, :-1].T), np.ascontiguousarray(q[:, -1])
    return np.ascontiguousarray(q.T), None


def _orth_blocks(w: np.ndarray, n_blocks: int, b: Optional[np.ndarray] = None):
    """Orthogonalize each of n_blocks equal slices along the output axis."""
    out = w.shape[-1]
    assert out % n_blocks == 0
    size = out // n_blocks
    w = w.copy()
    b = b.copy() if b is not None else None
    for i in range(n_blocks):
        sl = slice(i * size, (i + 1) * size)
        wi, bi = _orthogonalize_matrix(
            w[..., sl].reshape(-1, size), b[sl] if b is not None else None
        )
        w[..., sl] = wi.reshape(w[..., sl].shape)
        if b is not None and bi is not None:
            b[sl] = bi
    return w, b


def orthogonalize_params(params):
    """Walk the param tree and QR-orthogonalize every weight matrix.

    - {"w": ..., "b": ...} linear/conv pairs -> bias-augmented QR
      (conv kernels flattened to (k*in, out) first, matching Torch's
      2-D conv weight view);
    - GRU: w_zr treated as two (fan_in, H) matrices, w_h as one (all
      bias-free LinearZeroBias in the reference, GRU.lua:23-26);
    - LSTM: w_x per-gate with the (summed) gate bias, w_h per-gate
      without bias;
    - bare 2-D leaves (v, u): plain QR. 1-D leaves (w_e) untouched
      (a 1-row matrix is already orthogonal up to scale in Torch's QR).
    """

    def walk(node):
        if isinstance(node, dict):
            if "w_zr" in node:  # GRU cell
                new = dict(node)
                w_zr, _ = _orth_blocks(np.asarray(node["w_zr"]), 2)
                w_h, _ = _orthogonalize_matrix(np.asarray(node["w_h"]))
                new["w_zr"] = jnp.asarray(w_zr)
                new["w_h"] = jnp.asarray(w_h)
                return new
            if "w_x" in node and "w_h" in node:  # LSTM cell
                new = dict(node)
                w_x, b = _orth_blocks(np.asarray(node["w_x"]), 4, np.asarray(node["b"]))
                w_h, _ = _orth_blocks(np.asarray(node["w_h"]), 4)
                new["w_x"], new["b"], new["w_h"] = (
                    jnp.asarray(w_x), jnp.asarray(b), jnp.asarray(w_h),
                )
                if "w_peep" in node:
                    new["w_peep"] = walk(node["w_peep"])
                return new
            if "w" in node and hasattr(node["w"], "ndim") and node["w"].ndim >= 2:
                new = dict(node)
                w = np.asarray(node["w"])
                b = np.asarray(node["b"]) if "b" in node else None
                flat = w.reshape(-1, w.shape[-1])
                wo, bo = _orthogonalize_matrix(flat, b)
                new["w"] = jnp.asarray(wo.reshape(w.shape))
                if bo is not None:
                    new["b"] = jnp.asarray(bo)
                return new
            out = {}
            for k, v in node.items():
                if (
                    hasattr(v, "ndim")
                    and v.ndim >= 2
                    and k in ("v", "u")
                ):
                    wo, _ = _orthogonalize_matrix(np.asarray(v).reshape(-1, v.shape[-1]))
                    out[k] = jnp.asarray(wo.reshape(v.shape))
                elif isinstance(v, (dict, list)):
                    out[k] = walk(v)
                else:
                    out[k] = v
            return out
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params)


def check_orthogonal(w: jnp.ndarray, b: Optional[jnp.ndarray] = None) -> float:
    """||A A^T - I|| (or A^T A) — TrainUtils.checkOrthogonalization:29-50."""
    a = np.asarray(w).reshape(-1, w.shape[-1]).T
    if b is not None:
        a = np.concatenate([a, np.asarray(b)[:, None]], axis=1)
    if a.shape[0] > a.shape[1]:
        c = a.T @ a
    else:
        c = a @ a.T
    return float(np.linalg.norm(c - np.eye(c.shape[0])))
